"""Plan registry package.

Importing this package registers every named query (SURVEY.md §2.C) into
:mod:`etl_caic_spark.registry`. Modules are grouped by milestone surface.
"""

from etl_caic_spark.registry import REGISTRY, QuerySpec, all_specs  # noqa: F401

from etl_caic_spark.plans import relational  # noqa: F401,E402
from etl_caic_spark.plans import scalar  # noqa: F401,E402
from etl_caic_spark.plans import windows  # noqa: F401,E402
from etl_caic_spark.plans import llm  # noqa: F401,E402
from etl_caic_spark.plans import udfq  # noqa: F401,E402
from etl_caic_spark.plans import streamingq  # noqa: F401,E402
from etl_caic_spark.plans import caicq  # noqa: F401,E402
from etl_caic_spark.plans import multimodalq  # noqa: F401,E402
from etl_caic_spark.plans import relational2  # noqa: F401,E402
from etl_caic_spark.plans import relational3  # noqa: F401,E402
from etl_caic_spark.plans import relational4  # noqa: F401,E402
from etl_caic_spark.plans import relational5  # noqa: F401,E402
from etl_caic_spark.plans import formats  # noqa: F401,E402
from etl_caic_spark.plans import relational6  # noqa: F401,E402
from etl_caic_spark.plans import sampling  # noqa: F401,E402
from etl_caic_spark.plans import pipelineq  # noqa: F401,E402
from etl_caic_spark.plans import relational7  # noqa: F401,E402
from etl_caic_spark.plans import llm2  # noqa: F401,E402
