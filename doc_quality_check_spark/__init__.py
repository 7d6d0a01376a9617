"""doc_quality_check_spark — a from-scratch PySpark-native schema + constraint
validation engine with the query/data-processing capabilities of the reference
``kabeertest/doc-quality-check`` (a config-driven document quality checker),
re-expressed idiomatically on Spark DataFrames / Catalyst / Arrow.

The engine validates an Iceberg-style table of audio clip + transcript pairs
(clip_id:string, bytes:binary, sr_hz:int, dur_ms:int, codec:string,
transcript:string) with a declarative check suite: per-column stats,
threshold predicates with first-failure-wins reasons, uniqueness / referential
integrity, distribution drift (PSI/KS), and vectorized pandas-UDF payload
checks — emitting per-partition pass/fail verdicts, violation rows and a
resumable run manifest.

Reference parity citations live in each module's docstring (file:line into
/root/reference). This is not a port: no reference code is reused.
"""

from doc_quality_check_spark.session import get_spark
from doc_quality_check_spark.suite.spec import Check, CheckSuite, default_suite
from doc_quality_check_spark.suite.runner import SuiteRunner

__all__ = ["get_spark", "Check", "CheckSuite", "default_suite", "SuiteRunner"]
__version__ = "0.1.0"
