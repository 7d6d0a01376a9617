from doc_quality_check_spark.suite.spec import Check, CheckSuite, default_suite
from doc_quality_check_spark.suite.runner import SuiteRunner

__all__ = ["Check", "CheckSuite", "default_suite", "SuiteRunner"]
