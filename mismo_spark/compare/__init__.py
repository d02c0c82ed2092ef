from mismo_spark.compare.enum import EnumComparer, LevelCase

__all__ = ["EnumComparer", "LevelCase"]
