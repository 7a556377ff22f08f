"""json_schema_rs_spark — a PySpark-native schema + constraint validation
engine with the semantics of goddtriffin/json-schema-rs, re-expressed as
vectorized Spark SQL expressions over transcript-shaped tables, plus the
table-level checks (uniqueness, referential integrity, ordering, stats,
drift) and training-data operators (dedup, similarity, text analysis) a
100 TB pipeline needs.

Public API:

    from json_schema_rs_spark import ValidationEngine, parse_spec
    engine = ValidationEngine(spec_dict, key_cols=("conv_id", "turn_idx"))
    report = engine.validate(df)
    report.violations   # DataFrame[conv_id, turn_idx, instance_path, code, message]
    report.flagged      # input DataFrame + `valid` boolean + `violations` array
"""

from .plans.spec import SchemaNode, SpecParseError, parse_spec, resolved_spec_version
from .plans.pyvalidator import Violation, validate
from .operators.runner import ValidationEngine, ValidationReport

__all__ = [
    "SchemaNode",
    "SpecParseError",
    "parse_spec",
    "resolved_spec_version",
    "Violation",
    "validate",
    "ValidationEngine",
    "ValidationReport",
]
