"""Hot-conversation skew: the north_rule requires partitioning / shuffle /
skew handled explicitly. These tests run the skew knob END TO END — a
table where half of all turns live in 3 hot conversations — and assert
the engine's outputs are partitioning-invariant and salt-invariant on it
(the failure mode of broken skew handling is wrong results on the salted
two-phase path, or results that change with the input's physical layout).
"""

from pyspark.sql import functions as F

from json_schema_rs_spark.operators.pipeline import transcript_pipeline
from json_schema_rs_spark.operators.table_checks import uniqueness_violations
from json_schema_rs_spark.sources.synth import (
    ROLES,
    TOOLS,
    TRANSCRIPT_SCHEMA,
    synth_transcripts_pandas,
)

SPEC = {
    "type": "object",
    "required": ["conv_id", "turn_idx", "role", "text"],
    "properties": {
        "role": {"type": "string", "enum": ROLES},
        "text": {"type": "string", "minLength": 1, "maxLength": 4000},
        "turn_idx": {"type": "integer", "minimum": 0},
    },
}


def _skewed_df(spark):
    # skew_hot_fraction adds hot turns on top of the per-conv baseline:
    # fraction 1.0 over 200x10 puts ~2000 extra turns into 3 hot
    # conversations, i.e. the hot 3 hold ~half of all rows
    pdf = synth_transcripts_pandas(
        n_conversations=200, turns_per_conv=10, seed=5,
        violation_rate=0.1, skew_hot_fraction=1.0,
        skew_hot_conversations=3)
    return spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA)


def test_skew_shape_is_real(spark):
    """Sanity on the knob itself: 3 conversations hold ~half the turns."""
    df = _skewed_df(spark)
    sizes = {r["conv_id"]: r["n"] for r in
             df.groupBy("conv_id").agg(F.count("*").alias("n")).collect()}
    hot = sorted(sizes.values(), reverse=True)[:3]
    assert sum(hot) >= 0.45 * sum(sizes.values())


def test_pipeline_partitioning_invariant_under_skew(spark):
    """The fused pipeline's violation rows must not depend on the physical
    layout of a skewed input (single partition, hash-64, range-by-ts)."""
    df = _skewed_df(spark)
    base = sorted(tuple(r) for r in transcript_pipeline(
        df, SPEC, vocabularies={"tool": TOOLS}).collect())
    assert len(base) > 50
    for variant in (df.coalesce(1), df.repartition(64),
                    df.repartitionByRange(16, "ts")):
        got = sorted(tuple(r) for r in transcript_pipeline(
            variant, SPEC, vocabularies={"tool": TOOLS}).collect())
        assert got == base


def test_salted_uniqueness_equals_plain_on_skewed_keys(spark):
    """The salted two-phase aggregation (the hot-key escape hatch) must be
    value-identical to the plain path ON A SKEWED TABLE — where the hot
    conversations actually stress the salt fan-out/merge."""
    df = _skewed_df(spark)
    # inject real duplicates into a hot conversation
    dupes = df.filter(F.col("conv_id") == "conv_00000000").limit(25)
    t = df.unionByName(dupes)
    plain = {tuple(r) for r in uniqueness_violations(t).collect()}
    salted = {tuple(r) for r in uniqueness_violations(t, salt=16).collect()}
    assert plain == salted
    assert len(plain) >= 25
