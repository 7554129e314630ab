from incubator_impala_spark.functions.registry import MACROS, register_all

__all__ = ["MACROS", "register_all"]
