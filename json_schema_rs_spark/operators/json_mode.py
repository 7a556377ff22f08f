"""JSON document-column validation — the byte-exact slow path.

The typed-column compiler (:mod:`..plans.compiler`) covers the transcript
table's fixed schema with zero-shuffle vectorized expressions. Payload
columns holding arbitrary nested JSON (e.g. a tool-call arguments string)
need the full recursive keyword ladder; this module runs the
reference-semantics pure-Python validator (:mod:`..plans.pyvalidator`,
itself a line-by-line twin of
`/root/reference/json_schema_rs/src/validator/mod.rs:58-450`) inside
Arrow-batched ``mapInPandas`` — whole record batches cross the JVM/Python
boundary once, and the spec is parsed exactly once per executor (closure
capture), mirroring "parse once, validate many".

Contract notes:

- a NULL payload is an *absent* document — no violations (same convention
  as the typed compiler's ``null_is_absent``);
- unparseable JSON yields one engine-extension violation
  ``code='InvalidJson'`` (the reference CLI aborts before validation on a
  bad payload, `cli/validate.rs:17-20`; a table engine must instead record
  and continue);
- ``instance_path`` and message locations are re-rooted under
  ``/<column>`` so payload violations compose with table-level ones in a
  single sink.
"""

from __future__ import annotations

import json
from typing import Iterator, Sequence, Union

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..plans.pyvalidator import validate
from ..plans.spec import SchemaNode, parse_spec


def _reroot(path: str, message: str, prefix: str) -> tuple[str, str]:
    """Re-root a document-relative violation under ``prefix``. The message
    always begins with ``{display_loc}: `` where display_loc is "root"
    for the empty pointer, else the pointer itself (json_pointer.rs:230-236).
    """
    old_loc = "root" if path == "" else path
    new_path = prefix + path
    body = message[len(old_loc) + 2:]
    return new_path, f"{new_path}: {body}"


def validate_json_column(
    df: DataFrame,
    spec: Union[str, bytes, dict, SchemaNode],
    json_col: str,
    *,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    strict: bool = False,
    extensions: bool = False,
) -> DataFrame:
    """Violations for a JSON-document string column:
    ``(key cols..., instance_path, code, message)``.

    Embarrassingly parallel: scan → mapInPandas → rows. The Python cost
    is per *violating or parsed* document, amortized over Arrow batches;
    for fixed-schema payloads prefer expressing the constraints over
    typed columns (the fast path).

    Parallelism guard (same rationale as ``dedup._spread``): this is the
    engine's most Python-heavy operator (json.loads + interpreter per
    document), so a small table scanning as ONE parquet row group would
    serialize the whole job on a single core. A production table is many
    files (guard is a free no-op); locally the skinny (keys, payload)
    projection is hash-spread once. Output is per-row, so results are
    partitioning-invariant."""
    root = spec if isinstance(spec, SchemaNode) else parse_spec(
        spec, strict=strict, extensions=extensions)
    keys = list(key_cols)
    prefix = "/" + json_col

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [in_fields[k] for k in keys]
        + [T.StructField("instance_path", T.StringType()),
           T.StructField("code", T.StringType()),
           T.StructField("message", T.StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in out_schema.names}

            def emit(i: int, path: str, code: str, message: str) -> None:
                for k in keys:
                    out[k].append(pdf[k].iloc[i])
                out["instance_path"].append(path)
                out["code"].append(code)
                out["message"].append(message)

            for i, doc in enumerate(pdf[json_col]):
                if doc is None or (isinstance(doc, float) and pd.isna(doc)):
                    continue  # absent payload
                try:
                    instance = json.loads(doc)
                except (TypeError, ValueError) as e:
                    emit(i, prefix, "InvalidJson",
                         f"{prefix}: invalid JSON payload: {e}")
                    continue
                for v in validate(root, instance):
                    path, message = _reroot(v.path, v.message, prefix)
                    emit(i, path, v.code, message)
            yield pd.DataFrame(out)

    from .dedup import _spread
    src = _spread(df.select(*keys, json_col), *keys)
    return src.mapInPandas(run, schema=out_schema)


def json_key_profile(
    df: DataFrame,
    json_col: str,
    *,
    round_digits: int = 6,
) -> DataFrame:
    """Schema discovery for a JSON payload column: per top-level key and
    JSON-Schema type kind, how many documents carry it —
    ``(key, kind, n_values, frac_of_docs)`` ordered by ``(key, kind)``.

    The profiling complement of :func:`validate_json_column` and the
    payload-mode analog of the reverse-codegen path
    (`/root/reference/json_schema_rs/src/reverse_code_gen/mod.rs:14-17` —
    type -> schema): before an operator WRITES a spec for a payload
    column, this answers "what keys actually occur, with what types, how
    often" — ``frac_of_docs == 1.0`` keys are ``required`` candidates,
    single-kind keys get a ``type``, and the kinds are emitted in the
    JSON-Schema ``type`` vocabulary (object / array / string / integer /
    number / boolean / null) so the profile feeds spec authoring
    directly.

    Scale shape: scan -> ``try_parse_json`` -> ``variant_explode``
    (row-local generator; fan-out bounded by keys per document) -> ONE
    hash aggregate on (key, kind) with map-side partial combine — only
    vocabulary-sized (key, kind, partial-count) rows shuffle, never the
    payloads. The document total rides a 1-row broadcast attach (the
    ``hot_key_stats`` totals pattern). Zero Python anywhere. NULL and
    malformed payloads contribute no keys but stay in the denominator
    (``try_parse_json`` -> NULL -> generator emits nothing), so
    ``frac_of_docs`` reads as "fraction of ALL rows where this key holds
    a value of this kind".

    Note this does NOT contradict the VARIANT negative result below: that
    experiment bound per-PROPERTY accessors (one ``variant_get`` tree per
    spec property) against the pandas validator; here the single
    ``variant_explode`` generator is the whole workload and there is no
    per-row Python to compete with.

    Numeric kind boundary (both engines, pinned by the oracle entry):
    a JSON number is ``integer`` iff it lexes as an int64 (no ``.``/
    exponent, value within i64) — Spark's variant parser types those
    TINYINT..BIGINT and DuckDB's ``json_type`` says BIGINT; anything
    fractional, exponential, or above i64::MAX is ``number`` (Spark
    DECIMAL/DOUBLE — a uint64-range int parses as DECIMAL(20,0) —
    DuckDB DOUBLE/UBIGINT). This matches the reference's serde
    ``as_i64`` rule: "1.0 is not an integer" and ints past i64::MAX
    fail the integer check (`validator/mod.rs:291-297`)."""
    from pyspark.sql import functions as F

    # variant_explode is a table-valued generator: LATERAL-join form
    # (emits nothing for NULL / non-object variants, which is exactly the
    # malformed-payload contract we want from try_parse_json -> NULL).
    src = df.selectExpr(f"try_parse_json({json_col}) AS __v")
    pairs = (src.lateralJoin(
                 df.sparkSession.tvf.variant_explode(F.col("__v").outer()))
             # a top-level ARRAY explodes to (pos, key=NULL, value) rows;
             # only object fields profile (keys are never NULL on objects)
             .where(F.col("key").isNotNull())
             .select(F.col("key"),
                     F.expr("schema_of_variant(value)").alias("sv")))
    kind = (
        F.when(F.col("sv").startswith("OBJECT"), F.lit("object"))
        .when(F.col("sv").startswith("ARRAY"), F.lit("array"))
        .when(F.col("sv") == "STRING", F.lit("string"))
        .when(F.col("sv").isin("TINYINT", "SMALLINT", "INT", "BIGINT"),
              F.lit("integer"))
        .when(F.col("sv").startswith("DECIMAL")
              | F.col("sv").isin("FLOAT", "DOUBLE"), F.lit("number"))
        .when(F.col("sv") == "BOOLEAN", F.lit("boolean"))
        .when(F.col("sv") == "VOID", F.lit("null"))
        .otherwise(F.lit("other"))
    )
    counts = (pairs.select("key", kind.alias("kind"))
              .groupBy("key", "kind").agg(F.count("*").alias("n_values")))
    total = df.select(F.count("*").alias("__n_docs"))
    return (counts.join(F.broadcast(total))
            .select("key", "kind", "n_values",
                    F.round(F.col("n_values") / F.col("__n_docs"),
                            round_digits).alias("frac_of_docs"))
            .orderBy("key", "kind"))


def spec_from_json_profile(
    profile,
    *,
    required_min_frac: float = 1.0,
) -> dict:
    """MEASURED payload profile -> constraint spec: the JSON-mode twin of
    :func:`..plans.infer.spec_from_profile` (typed columns) closing the
    discovery arc — :func:`json_key_profile` over last week's payloads,
    this function, then :func:`validate_json_column` over this week's:
    envelope drift becomes typed violation rows.

    ``profile`` is a :func:`json_key_profile` result (DataFrame or its
    collected rows — vocabulary-sized either way). Pure driver logic:

    - a key whose presence fraction (summed over kinds) >=
      ``required_min_frac`` goes in ``required``;
    - a key observed with exactly ONE kind that is a JSON-Schema type
      (not ``null``/``other``) gets ``{"type": kind}`` — multi-kind keys
      stay unconstrained rather than guessing (the reference validates
      first-type-only, union types unsupported, design.md:405), and a
      key ever seen as JSON null gets no type (``type:"integer"`` would
      fire ``ExpectedInteger`` on the very null that was profiled);
    - every observed key appears in ``properties`` (so
      ``additionalProperties`` policies can be layered on by hand).

    By construction the PROFILED payloads validate clean under the
    returned spec (every required/type fact was measured on them)."""
    rows = profile.collect() if isinstance(profile, DataFrame) else profile
    by_key: dict[str, dict] = {}
    for r in rows:
        d = by_key.setdefault(r["key"], {"kinds": set(), "frac": 0.0})
        d["kinds"].add(r["kind"])
        d["frac"] += r["frac_of_docs"] or 0.0
    properties: dict[str, dict] = {}
    required: list[str] = []
    typed_kinds = {"object", "array", "string", "integer", "number",
                   "boolean"}
    for key in sorted(by_key):
        info = by_key[key]
        node: dict = {}
        if len(info["kinds"]) == 1:
            (kind,) = info["kinds"]
            if kind in typed_kinds:
                node = {"type": kind}
        properties[key] = node
        # fracs are 6dp-rounded; allow one rounding ulp per contributing
        # kind so an everywhere-present multi-kind key can't sum to
        # 0.999999 and silently miss the required list
        tol = 5e-7 * len(info["kinds"])
        if info["frac"] >= required_min_frac - tol:
            required.append(key)
    spec: dict = {"type": "object", "properties": properties}
    if required:
        spec["required"] = required
    return spec


# ---------------------------------------------------------------------------
# Negative result (round 2), recorded so it is not re-attempted blindly:
# a VARIANT-based vectorized fast path (try_parse_json + per-property
# variant_get/schema_of_variant kind dispatch) was built, brought to full
# byte-parity with this pandas path on a 39-payload keyword corpus, and
# then MEASURED SLOWER — 3.99s vs 0.56s on 300k realistic 20-field
# payloads at 1% violation rate (local[32]); variant accessor evaluation
# dominates, while json.loads is C-speed and the per-document Python
# interpreter is cheap at these document sizes. The pandas path below IS
# the supported payload path; its byte-exact semantics double as the
# truth oracle. (Kept from the experiment: the i64-range fix in
# pyvalidator._is_integer and the keyword-corpus parity tests.)
# ---------------------------------------------------------------------------
