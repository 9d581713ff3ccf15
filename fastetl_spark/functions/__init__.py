from fastetl_spark.functions.stable import davg, dmul, dsum

__all__ = ["dsum", "davg", "dmul"]
