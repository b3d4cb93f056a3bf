"""Registry-count drift guard (round-5 verdict ask): the README and the
final COVERAGE.md "Registry:" line must agree with the live registry, so
the docs can't silently lag the code again."""

from __future__ import annotations

import re
from pathlib import Path

from etl_caic_spark.registry import all_specs

REPO = Path(__file__).resolve().parent.parent


def test_readme_count_matches_registry():
    specs = all_specs()
    readme = (REPO / "README.md").read_text()
    m = re.search(r"(\d+) registered queries", readme)
    assert m, "README.md lost its 'N registered queries' line"
    assert int(m.group(1)) == len(specs), (
        f"README says {m.group(1)} queries, registry has {len(specs)} — "
        "update README.md"
    )


def test_coverage_final_line_matches_registry():
    specs = all_specs()
    n_oracled = sum(1 for s in specs.values() if s.oracle is not None)
    cov = (REPO / "COVERAGE.md").read_text()
    lines = re.findall(r"Registry: \*\*(\d+) queries, (\d+) oracled", cov)
    assert lines, "COVERAGE.md lost its 'Registry:' lines"
    n_q, n_o = map(int, lines[-1])
    assert (n_q, n_o) == (len(specs), n_oracled), (
        f"COVERAGE.md final Registry line says {n_q}/{n_o}, live registry "
        f"is {len(specs)}/{n_oracled} — append a fresh Registry line"
    )


def test_driver_window_is_exactly_50_registered_names():
    from etl_caic_spark.plans import _DRIVER_WINDOW

    specs = all_specs()
    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50
    for name in _DRIVER_WINDOW:
        assert name in specs
    assert list(specs)[:50] == list(_DRIVER_WINDOW)
