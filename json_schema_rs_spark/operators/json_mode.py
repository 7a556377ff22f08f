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
