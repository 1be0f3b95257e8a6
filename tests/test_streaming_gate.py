"""Streaming curation gate (streaming/gate.py): availableNow drive ≡
batch curation_gate, exactly-once replay, and per-batch index freshness
(a digest-index refresh lands mid-query without restarting)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from tap_postgres_spark import curation, textops
from tap_postgres_spark.digestindex import (
    bootstrap_digest_index,
    refresh_digest_index,
)
from tap_postgres_spark.lake import LakeTable
from tap_postgres_spark.schema import widen_for_cdc
from tap_postgres_spark.streaming.gate import StreamingCurationGate

from tests.test_curation import GOOD, GOOD2, GOOD3, GOOD4, JUNK, MH

SCHEMA = widen_for_cdc(
    T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("content", T.StringType(), True),
        ]
    )
)

FRESH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("content", T.StringType(), True),
    ]
)

NOVEL = "a long road of stone runs from the town to the hills and the walkers of old use it with care"


@pytest.fixture()
def corpus(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "base"), SCHEMA, ["doc_id"], num_buckets=2
    )
    t.merge_into(
        spark.createDataFrame(
            [(d, c, 10 + d, None, 1, "U") for d, c in
             [(1, GOOD), (2, GOOD2), (3, GOOD3)]],
            "doc_id long, content string, _sdc_lsn long, "
            "_sdc_deleted_at string, txid long, _action string",
        ),
        epoch_id="seed",
    )
    root = str(tmp_path / "didx")
    bootstrap_digest_index(spark, t, root, text_col="content", n_cells=4)
    return t, root


def _gate(spark, tmp_path, corpus, **kw):
    t, root = corpus
    return StreamingCurationGate(
        spark,
        str(tmp_path / "feed"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        schema=FRESH_SCHEMA,
        digest_index_root=root,
        minhash_index_loader=lambda: textops.minhash_banded(
            t.read().select("doc_id", "content"), "content", "doc_id", **MH
        ),
        text_col="content",
        id_col="doc_id",
        **MH,
        **kw,
    )


def _feed(spark, tmp_path, name, rows):
    # the file stream source lists FILES in the feed dir (subdirectories
    # would read as partition dirs): stage the single part file and move
    # it into place under the target name
    import glob
    import os
    import shutil

    stage = tmp_path / "_stage" / name
    spark.createDataFrame(rows, FRESH_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(stage))
    (tmp_path / "feed").mkdir(exist_ok=True)
    part = glob.glob(str(stage / "part-*.parquet"))[0]
    shutil.move(part, str(tmp_path / "feed" / f"{name}.parquet"))
    shutil.rmtree(str(stage))
    os.sync()


class TestStreamingGate:
    def test_stream_equals_batch_and_exactly_once(self, spark, tmp_path, corpus):
        t, root = corpus
        b1 = [(100, JUNK), (101, GOOD)]
        b2 = [(102, GOOD2.upper()), (103, GOOD4)]
        _feed(spark, tmp_path, "f1", b1)
        _feed(spark, tmp_path, "f2", b2)

        g = _gate(spark, tmp_path, corpus, max_files_per_trigger=1)
        g.run_available_now()
        got = {(r.doc_id, r.verdict) for r in g.verdicts().collect()}

        fresh = spark.createDataFrame(b1 + b2, FRESH_SCHEMA)
        expected = {
            (r.doc_id, r.verdict)
            for r in curation.curation_gate(
                spark, fresh,
                digest_index_root=root,
                minhash_index=g.minhash_index_loader(),
                text_col="content", id_col="doc_id", **MH,
            ).collect()
        }
        assert got == expected
        assert dict(got) == {
            100: "drop_quality", 101: "drop_exact",
            102: "drop_neardup", 103: "keep",
        }
        # maxFilesPerTrigger=1 → one micro-batch per feed file
        assert {r.batch_id for r in g.verdicts().collect()} == {0, 1}

        # replay with the same checkpoint: nothing new lands
        g2 = _gate(spark, tmp_path, corpus, max_files_per_trigger=1)
        assert g2.run_available_now() == []
        assert {(r.doc_id, r.verdict) for r in g2.verdicts().collect()} == got

    def test_index_refresh_lands_mid_query(self, spark, tmp_path, corpus):
        t, root = corpus
        _feed(spark, tmp_path, "f1", [(200, NOVEL)])
        g = _gate(spark, tmp_path, corpus)
        g.run_available_now()
        assert {
            (r.doc_id, r.verdict) for r in g.verdicts().collect()
        } == {(200, "keep")}

        # the kept doc is merged into the corpus and the digest index
        # refreshes off the changelog — no query restart
        t.merge_into(
            spark.createDataFrame(
                [(4, NOVEL, 20, None, 2, "U")],
                "doc_id long, content string, _sdc_lsn long, "
                "_sdc_deleted_at string, txid long, _action string",
            ),
            epoch_id="grow",
        )
        refresh_digest_index(t, root)

        _feed(spark, tmp_path, "f2", [(201, NOVEL)])  # exact dup of new doc
        g.run_available_now()
        assert {
            (r.doc_id, r.verdict) for r in g.verdicts().collect()
        } == {(200, "keep"), (201, "drop_exact")}
