"""Multimodal plumbing tests: schema, batch shape, determinism of the
stubbed decode (FIXTURES-free; synthetic media built in-test)."""

import pytest

pytestmark = pytest.mark.spark


class TestMultimodal:
    def test_featurize_schema_and_determinism(self, spark):
        from lightly_ocr_spark.operators.multimodal import (
            FEATURE_DIM,
            featurize_media,
            synthetic_media,
        )

        media = synthetic_media(spark, n=96)
        out1 = featurize_media(media).collect()
        out2 = featurize_media(media).collect()
        assert len(out1) == 96
        by_id1 = {r["media_id"]: r for r in out1}
        by_id2 = {r["media_id"]: r for r in out2}
        for i in range(96):
            a, b = by_id1[i], by_id2[i]
            assert a["features"] == b["features"]  # deterministic stub
            assert len(a["features"]) == FEATURE_DIM
            assert a["decoder"] == "stub-sha256"
            assert a["n_bytes"] > 0 and len(a["payload_sha256"]) == 64

    def test_real_decoder_is_explicitly_stubbed(self):
        from lightly_ocr_spark.operators.multimodal import HAVE_PIL, decode_image

        if not HAVE_PIL:
            with pytest.raises(NotImplementedError):
                decode_image(b"\x89PNG fake")

    def test_features_feed_ann_pipeline(self, spark):
        """Stub features flow into the similarity operator unchanged —
        the multimodal -> ANN join-up a training pipeline needs."""
        from pyspark.sql import functions as F

        from lightly_ocr_spark.operators.multimodal import (
            featurize_media,
            synthetic_media,
        )
        from lightly_ocr_spark.operators.similarity import _dot, _norm

        feats = featurize_media(synthetic_media(spark, n=64))
        q = feats.filter(F.col("media_id") == 0).first()["features"]
        qcol = F.array(*[F.lit(float(v)) for v in q])
        sims = feats.select(
            "media_id",
            (_dot(F.col("features"), qcol)
             / (_norm(F.col("features")) * _norm(qcol))).alias("cos"),
        ).collect()
        self_sim = [r["cos"] for r in sims if r["media_id"] == 0][0]
        assert abs(self_sim - 1.0) < 1e-6
        assert all(-1.0 - 1e-9 <= r["cos"] <= 1.0 + 1e-9 for r in sims)
