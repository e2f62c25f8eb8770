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

    def test_header_probe_parses_crafted_headers(self):
        """The probe must recover exact dims from each supported format and
        refuse truncated or bit-flipped payloads."""
        from lightly_ocr_spark.operators.multimodal import (
            make_gif,
            make_jpeg,
            make_png,
            probe_image,
        )

        for maker, mime in [(make_png, "image/png"), (make_gif, "image/gif"),
                            (make_jpeg, "image/jpeg")]:
            p = probe_image(maker(640, 480, b"tail-bytes"))
            assert p == {"mime": mime, "width": 640, "height": 480,
                         "valid": True}, (mime, p)

        # truncation: cut each crafted header before the dims land
        assert not probe_image(make_png(640, 480)[:20])["valid"]
        assert not probe_image(make_gif(640, 480)[:8])["valid"]
        assert not probe_image(make_jpeg(640, 480)[:6])["valid"]
        # PNG CRC: flip one width bit -> stored CRC no longer verifies
        png = bytearray(make_png(640, 480))
        png[16] ^= 0x01
        assert not probe_image(bytes(png))["valid"]
        # garbage / empty
        assert not probe_image(b"not an image at all")["valid"]
        assert not probe_image(b"")["valid"]
        assert not probe_image(None)["valid"]

    def test_probe_media_and_validity_filter(self, spark):
        """Spark-side probe: every synthetic image validates with dims
        matching its declared meta; a planted corrupt row is dropped by
        valid_media (the decode-probe F7 analog)."""
        from pyspark.sql import functions as F

        from lightly_ocr_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            make_png,
            probe_media,
            synthetic_media,
            valid_media,
        )

        media = synthetic_media(spark, n=96)
        images = media.filter(F.col("kind") == "image")
        probes = {r["media_id"]: r for r in probe_media(images).collect()}
        metas = {r["media_id"]: r["meta"] for r in images.collect()}
        assert probes and all(p["valid"] for p in probes.values())
        for mid, p in probes.items():
            assert p["width"] == metas[mid]["width"]
            assert p["height"] == metas[mid]["height"]
            assert p["mime_detected"] == metas[mid]["mime"]

        # plant: one truncated payload, one whose meta lies about the dims
        bad = spark.createDataFrame(
            [
                (9001, "image", make_png(64, 48)[:20],
                 {"width": 64, "height": 48, "sample_rate": None,
                  "n_frames": None, "mime": "image/png"}),
                (9002, "image", make_png(64, 48),
                 {"width": 999, "height": 48, "sample_rate": None,
                  "n_frames": None, "mime": "image/png"}),
            ],
            MEDIA_SCHEMA,
        )
        kept = valid_media(images.unionByName(bad))
        ids = {r["media_id"] for r in kept.collect()}
        assert 9001 not in ids and 9002 not in ids
        assert ids == {r["media_id"] for r in images.collect()}

        # audio/video rows pass through — the image probe must not judge
        # payloads it cannot parse (round-2 review finding: every valid
        # audio/video row was silently dropped)
        kept_all = valid_media(media)
        assert {r["media_id"] for r in kept_all.collect()} == {
            r["media_id"] for r in media.collect()
        }

    def test_probe_never_raises_on_arbitrary_bytes(self):
        """probe_image must classify, never crash: arbitrary byte soup and
        mutations of valid headers all return a well-formed dict."""
        import random

        from lightly_ocr_spark.operators.multimodal import (
            make_gif,
            make_jpeg,
            make_png,
            probe_image,
        )

        rng = random.Random(11)
        bases = [make_png(64, 48), make_gif(64, 48), make_jpeg(64, 48)]
        for trial in range(20000):
            if trial % 2:
                b = bytearray(bases[trial % 3])
                for _ in range(rng.randrange(1, 6)):
                    op = rng.randrange(3)
                    if op == 0 and b:
                        b[rng.randrange(len(b))] = rng.randrange(256)
                    elif op == 1 and b:
                        del b[rng.randrange(len(b))]
                    else:
                        b.insert(rng.randrange(len(b) + 1),
                                 rng.randrange(256))
                payload = bytes(b)
            else:
                payload = bytes(
                    rng.randrange(256) for _ in range(rng.randrange(0, 80))
                )
            p = probe_image(payload)
            assert set(p) == {"mime", "width", "height", "valid"}
            if p["valid"]:
                assert p["width"] > 0 and p["height"] > 0

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
