from tower_parse_spark.functions.extraction import (  # noqa: F401
    extract_lines,
    extraction_columns,
    unnamed_pattern,
)
