from mismo_spark.lib import email, geo, name, phone

__all__ = ["email", "geo", "name", "phone"]
