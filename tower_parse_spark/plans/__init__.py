from tower_parse_spark.plans.profile import (  # noqa: F401
    ConfigurationError,
    DeviceProfile,
    GroupSpec,
    validate_regex_branches,
)
