"""Query registry: every operator from SURVEY.md §2 (and the
LLM-pipeline extensions) exposed as a named (spark_fn, oracle_sql) pair.

The driver's correctness harness runs each Spark callable at sf=0.01
and hash-compares against the DuckDB oracle SQL — column names, types
and (rounded) values must match exactly.
"""

from dl_datalake_spark.queries.registry import ORACLE_SQL, QUERIES, register  # noqa: F401

# importing the modules populates the registry
from dl_datalake_spark.queries import relational  # noqa: F401, E402
from dl_datalake_spark.queries import relational2  # noqa: F401, E402
from dl_datalake_spark.queries import relational3  # noqa: F401, E402
from dl_datalake_spark.queries import relational4  # noqa: F401, E402
from dl_datalake_spark.queries import relational5  # noqa: F401, E402
from dl_datalake_spark.queries import relational6  # noqa: F401, E402
from dl_datalake_spark.queries import events  # noqa: F401, E402
from dl_datalake_spark.queries import temporal  # noqa: F401, E402
from dl_datalake_spark.queries import textops  # noqa: F401, E402
from dl_datalake_spark.queries import curation  # noqa: F401, E402
from dl_datalake_spark.queries import curation2  # noqa: F401, E402
from dl_datalake_spark.queries import curation3  # noqa: F401, E402
from dl_datalake_spark.queries import multimodalq  # noqa: F401, E402
from dl_datalake_spark.queries import dedupq  # noqa: F401, E402
from dl_datalake_spark.queries import simq  # noqa: F401, E402
from dl_datalake_spark.queries import wave5  # noqa: F401, E402
from dl_datalake_spark.queries import wave6  # noqa: F401, E402
from dl_datalake_spark.queries import wave7  # noqa: F401, E402
from dl_datalake_spark.queries import wave8  # noqa: F401, E402
from dl_datalake_spark.queries import wave9  # noqa: F401, E402
from dl_datalake_spark.queries import wave10  # noqa: F401, E402
from dl_datalake_spark.queries import wave11  # noqa: F401, E402
from dl_datalake_spark.queries import wave12  # noqa: F401, E402
from dl_datalake_spark.queries import wave13  # noqa: F401, E402
from dl_datalake_spark.queries import wave14  # noqa: F401, E402
from dl_datalake_spark.queries import wave15  # noqa: F401, E402
from dl_datalake_spark.queries import wave16  # noqa: F401, E402
from dl_datalake_spark.queries import wave17  # noqa: F401, E402
