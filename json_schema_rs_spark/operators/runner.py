"""Single-pass validation runner.

The Spark analog of the reference's ``validate(schema, instance)`` entry
point (`/root/reference/json_schema_rs/src/validator/mod.rs:53-55`), lifted
from one instance to a whole DataFrame: one narrow ``select`` computes the
full violation array per row (zero shuffle, whole-stage codegen), then

- ``flagged``   = input + ``violations`` array + ``valid`` boolean
  (``Ok iff errors.is_empty()``, validator/mod.rs:445-450);
- ``violations`` = exploded violation rows
  ``(key cols..., instance_path, code, message)`` — the violation-row
  contract from SURVEY.md §2.3;
- ``summary()``  = one aggregate pass (rows, valid rows, violation count).

At 100 TB this plan is embarrassingly parallel: no data movement, scan →
codegen'd select → sink; the only shuffles in the whole engine live in the
table-level checks (:mod:`.table_checks`).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Mapping, Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exprs import explode_rows
from ..plans.compiler import CompiledPlan, compile_table_spec
from ..plans.spec import SchemaNode, parse_spec


@dataclass
class ValidationReport:
    """Lazy DataFrames — nothing is computed until an action runs."""

    flagged: DataFrame
    violations: DataFrame

    def summary(self) -> dict:
        row = self.flagged.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("valid").cast("long")).alias("valid_rows"),
            F.sum(F.size("violations").cast("long")).alias("violation_count"),
        ).collect()[0]
        rows = row["rows"]
        valid = row["valid_rows"] or 0
        return {
            "rows": rows,
            "valid_rows": valid,
            "invalid_rows": rows - valid,
            "violation_count": row["violation_count"] or 0,
        }


class ValidationEngine:
    """Compiles a constraint spec once (driver-side) and validates any
    DataFrame with the table's schema in a single vectorized pass.

    The analog of EP2 in SURVEY.md §3: ``JsonSchema::try_from`` +
    ``validate`` become ``ValidationEngine(spec)`` + ``engine.validate(df)``.
    """

    def __init__(
        self,
        spec: Union[str, bytes, dict, SchemaNode],
        *,
        key_cols: Sequence[str] = ("conv_id", "turn_idx"),
        strict: bool = False,
        extensions: bool = False,
    ) -> None:
        # extensions=True opts into the draft-2020-12 keyword extensions
        # (spec.EXTENSION_KEYWORDS); off = byte-identical reference parity
        self.root = spec if isinstance(spec, SchemaNode) else parse_spec(
            spec, strict=strict, extensions=extensions)
        self.key_cols = list(key_cols)
        self._plan_cache: dict[str, CompiledPlan] = {}

    def plan_for(self, df: DataFrame) -> CompiledPlan:
        key = df.schema.simpleString()
        if key not in self._plan_cache:
            self._plan_cache[key] = compile_table_spec(self.root, df.schema)
        return self._plan_cache[key]

    def violations_array(self, df: DataFrame) -> Column:
        """The violation array as a bare Column — only valid for specs
        without combinators (whose validities compile to shared helper
        columns); use :meth:`attach_violations` for the general case."""
        plan = self.plan_for(df)
        if plan.shared_cols:
            raise ValueError(
                "spec uses combinators whose shared validities compile to "
                "helper columns; use attach_violations(df) instead")
        return plan.violations_array()

    def attach_violations(self, df: DataFrame,
                          out_col: str = "violations") -> DataFrame:
        """Input + the per-row violation array (shared validity helper
        columns are attached and dropped internally)."""
        return self.plan_for(df).apply(df, out_col)

    def validate(self, df: DataFrame, *, keep_columns: Optional[Sequence[str]] = None) -> ValidationReport:
        """Run the compiled plan. ``keep_columns`` restricts the flagged
        output's payload columns (key columns are always kept)."""
        plan = self.plan_for(df)
        keys = [k for k in self.key_cols if k in df.columns]
        if plan.has_python_stage:
            # The plan carries an Arrow pandas-UDF slow path (content
            # keywords / rare ECMA-fallback pattern), whose cost is the
            # Python map side running at SCAN parallelism. A small table
            # in one parquet row group would serialize that stage on a
            # single core — insert dedup._spread's local-parallelism
            # guard (a no-op on production many-file tables; pure-codegen
            # plans never take this branch, staying exchange-free).
            if keys:
                from .dedup import _spread
                df = _spread(df, keys[0], *keys[1:])
            else:
                target = df.sparkSession.sparkContext.defaultParallelism
                if df.rdd.getNumPartitions() < target:
                    df = df.repartition(target)
        flagged = self.attach_violations(df).withColumn(
            "valid", F.size("violations") == 0
        )
        # filter-then-render: select violating rows with the CHEAP check
        # conditions, then build message strings only for the survivors
        # (message subtrees would otherwise evaluate per scanned row)
        violations = (
            explode_rows(
                plan.prepare(df).filter(plan.any_violation()),
                keys, plan.violations_array(), "v")
            .select(*keys, "v.instance_path", "v.code", "v.message")
        )
        if keep_columns is not None:
            keep = list(dict.fromkeys([*keys, *keep_columns, "violations", "valid"]))
            flagged = flagged.select(*keep)
        return ValidationReport(flagged=flagged, violations=violations)

def multi_spec_validate(
    df: DataFrame,
    specs: Mapping[str, Union[str, bytes, dict, SchemaNode]],
    *,
    spec_col: str = "spec_id",
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    strict: bool = False,
    extensions: bool = False,
    strategy: str = "union",
) -> ValidationReport:
    """Per-row spec routing: each row is validated against the spec
    version its ``spec_col`` value names. The multi-tenant / schema-
    registry shape of validation at scale — a 10^12-turn corpus is never
    all on one spec version; the alternative (one run per version over
    the full table) re-scans the corpus N times.

    Every spec compiles ONCE on the driver. Two physical strategies,
    both shuffle-free:

    - ``"union"`` (default): one scan->filter->codegen branch per
      version, unioned. Each branch's ``spec_col = v`` filter is pushed
      into its scan, so when ``spec_col`` is a partition/cluster column
      of the table (the at-scale layout — version-partitioned ingest),
      each branch prunes to ITS files and every row is scanned and
      evaluated exactly once. On unpartitioned input the source is
      scanned once per version — prefer ``"case"`` there.
    - ``"case"``: a single scan computing every version's violation
      array and a CASE on ``spec_col`` selecting the row's one. One
      pass over the data; every row pays every spec's expression cost.
      Caveat: the combined projection concentrates every spec's
      message-building expressions into ONE generated method, which
      exceeds janino's 64 KB limit at 2+ non-trivial specs — Spark then
      falls back to interpreted projection (correct, logged as an ERROR
      by CodeGenerator, measured ~35% slower than union's per-branch
      codegen at sf0.1). Prefer ``"union"`` unless re-scanning the
      source dominates (e.g. an expensive non-reusable derivation).

    Rows with a NULL or unregistered ``spec_col`` are flagged with a
    single root ``UnknownSpecVersion`` violation rather than silently
    passing — an unknown version is a contract breach, not a skip.
    """
    if not specs:
        raise ValueError("multi_spec_validate needs at least one spec")
    if strategy not in ("union", "case"):
        raise ValueError(f"unknown strategy {strategy!r}")
    engines = {
        sid: ValidationEngine(spec, key_cols=key_cols, strict=strict,
                              extensions=extensions)
        for sid, spec in sorted(specs.items())}
    sids = list(engines)
    unknown_arr = F.array(F.struct(
        F.lit("").alias("instance_path"),
        F.lit("UnknownSpecVersion").alias("code"),
        F.concat(
            F.lit('root: spec version "'),
            F.coalesce(F.col(spec_col).cast("string"), F.lit("null")),
            F.lit('" is not registered'),
        ).alias("message")))

    if strategy == "union":
        branches = [
            eng.attach_violations(df.filter(F.col(spec_col) == F.lit(sid)))
            for sid, eng in engines.items()]
        unknown = df.filter(
            F.col(spec_col).isNull() | ~F.col(spec_col).isin(sids)
        ).withColumn("violations", unknown_arr)
        flagged = reduce(lambda a, b: a.unionByName(b),
                         branches + [unknown])
    else:
        out = df
        tmp_cols = []
        for i, (sid, eng) in enumerate(engines.items()):
            c = f"_msv_{i}"
            out = eng.attach_violations(out, out_col=c)
            tmp_cols.append((sid, c))
        case = unknown_arr
        for sid, c in reversed(tmp_cols):
            case = F.when(F.col(spec_col) == F.lit(sid), F.col(c)) \
                .otherwise(case)
        flagged = out.withColumn("violations", case) \
            .drop(*[c for _, c in tmp_cols])

    flagged = flagged.withColumn("valid", F.size("violations") == 0)
    keys = [k for k in key_cols if k in df.columns]
    violations = (
        explode_rows(
            flagged.filter(F.size("violations") > 0),
            [*keys, spec_col], F.col("violations"), "v")
        .select(*keys, spec_col,
                "v.instance_path", "v.code", "v.message"))
    return ValidationReport(flagged=flagged, violations=violations)
