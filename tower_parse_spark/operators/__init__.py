from tower_parse_spark.operators.pack import with_pack_id  # noqa: F401
