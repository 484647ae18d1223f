from cola_spark.filters.cuckoo import CuckooFilter

__all__ = ["CuckooFilter"]
