"""spark-submit entry point: refresh a derived table off a CDC base table.

The deployment shape for lake/derived.py — run after (or on a schedule
beside) the replay job::

    cd /root/repo && zip -qr /tmp/tps.zip tap_postgres_spark
    spark-submit --master local[8] --py-files /tmp/tps.zip \
        tools/submit_derived.py <base_table_dir> <derived_table_dir> [transform]

``transform`` selects a built-in derivation (default ``fingerprint``:
60-bit content hash per key — the dedup index; ``quality`` = the
pre-training quality-filter feature vector + token counts + language
guess; ``chargram`` = the bottom-k rolling char-gram sketch, the
insert-robust near-dup key).  First run bootstraps
(one full pass); every later run reads only the base changelog since
the derived table's recorded base version — O(changes), the point of
maintaining the index off CDC instead of recomputing it nightly.
Idempotent per base version (epoch guard), so a crashed-and-replayed
run is a no-op.  Prints one JSON summary line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tap_postgres_spark.functions import md5_60bit
from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.lake.derived import (
    bootstrap_derived,
    refresh_derived,
    refreshed_base_version,
)


def fingerprint_transform(keys: list[str]):
    def _t(df: DataFrame) -> DataFrame:
        return df.select(
            *keys, "_sdc_lsn", md5_60bit(F.col("content")).alias("fp")
        )

    return _t


def quality_transform(keys: list[str]):
    """Per-key quality-filter features over ``content`` — the index a
    training pipeline reads instead of re-scoring the corpus nightly.
    All pure column expressions, so the incremental refresh is one
    column-pruned pass over the changelog rows."""
    from tap_postgres_spark import textops

    def _t(df: DataFrame) -> DataFrame:
        scored = textops.lang_id(
            textops.quality_features(df, text_col="content"),
            text_col="content",
        )
        return scored.select(
            *keys, "_sdc_lsn",
            "q_chars", "q_tokens", "q_punct_ratio", "q_stopword_ratio",
            textops.token_count_bpe(F.col("content")).alias("n_bpe"),
            "lang_pred",
        )

    return _t


def chargram_transform(keys: list[str]):
    """Bottom-k rolling char-gram sketch per key (insert-robust near-dup
    key), canonicalized to a comma-joined string column."""
    from tap_postgres_spark import textops

    def _t(df: DataFrame) -> DataFrame:
        return df.select(
            *keys, "_sdc_lsn",
            F.concat_ws(
                ",", textops.chargram_sketch(F.col("content"), k=5, sketch_size=8)
            ).alias("sketch"),
        )

    return _t


_MINHASH_BANDS = 4


def minhash_transform(keys: list[str]):
    """Banded MinHash signature INDEX per key — the corpus-dedup index
    maintained incrementally off CDC (multi-row derivation: one row per
    (key, band), so the derived table is keyed on keys + band).  New
    documents probe it with textops.probe_minhash_index at O(|new|)
    instead of re-signing a 10^10-doc corpus."""
    from pyspark.sql import functions as F

    from tap_postgres_spark import textops

    def _t(df: DataFrame) -> DataFrame:
        # _sdc_lsn rides the signature groupBy as an extra grouping
        # column: live rows are one-per-key, so (keys, lsn) groups are
        # the same groups and the banded relation keeps the LSN without
        # a rejoin shuffle
        return textops.minhash_banded(
            df.select(*keys, "_sdc_lsn", "content"),
            "content", [*keys, "_sdc_lsn"],
            bands=_MINHASH_BANDS,
        )

    def _expand(tombs: DataFrame) -> DataFrame:
        return tombs.withColumn(
            "band",
            F.explode(F.sequence(F.lit(0), F.lit(_MINHASH_BANDS - 1))),
        )

    return _t, ("band",), _expand


def _one_to_one(factory):
    def _f(keys: list[str]):
        return factory(keys), (), None

    return _f


TRANSFORMS = {
    "fingerprint": _one_to_one(fingerprint_transform),
    "quality": _one_to_one(quality_transform),
    "chargram": _one_to_one(chargram_transform),
    "minhash": minhash_transform,
}


def main() -> None:
    base_dir, derived_dir = sys.argv[1:3]
    name = sys.argv[3] if len(sys.argv) > 3 else "fingerprint"
    spark = SparkSession.builder.getOrCreate()
    base = LakeTable(spark, base_dir)
    transform, extra_keys, expand = TRANSFORMS[name](base.key_columns)
    if LakeTable.exists(derived_dir):
        derived = LakeTable(spark, derived_dir)
        res = refresh_derived(
            base, derived, transform, expand_tombstones=expand
        )
        mode = "refresh"
    else:
        derived = bootstrap_derived(
            spark, base, derived_dir, transform, extra_keys=extra_keys
        )
        res = {"skipped": False, "version": derived.current_version()}
        mode = "bootstrap"
    print(
        json.dumps(
            {
                "mode": mode,
                "transform": name,
                "base_version": base.current_version(),
                "derived_at_base_version": refreshed_base_version(derived),
                "derived_version": derived.current_version(),
                "skipped": bool(res.get("skipped")),
                "derived_rows": derived.read().count(),
            }
        )
    )


if __name__ == "__main__":
    main()
