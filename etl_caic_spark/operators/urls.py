"""URL canonicalization — the first dedup key of any web-scale corpus
(crawl dedup happens on canonical URL before any content hashing).

canonicalize_url() is a pure Column expression (regexp + HOF filters, no
UDF): lowercase scheme/host, strip default ports (https:443 / http:80),
drop the fragment, strip trailing path slashes, drop tracking params
(utm_*, ref), and sort the surviving query params so equivalent URLs
compare equal. Every rule is also expressible in ANSI-ish SQL, so the
dedup query is fully oracled.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = "\\?([^#]*)"


def canonicalize_url(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    host = (
        F.when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), "/+$", "")
    query = F.regexp_extract(url, _QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("ref="),
        )
    )
    qs = F.concat_ws("&", params)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
