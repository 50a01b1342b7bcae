"""Multimodal operator tests: the decode hook's two branches and the
determinism contract of the byte-level feature path.

``decode_image`` activates real PIL decode when the library exists
(clusters usually ship it) and raises NotImplementedError otherwise
(this container ships no imaging lib).  The registered feature queries
stay on the deterministic byte path in BOTH cases so their oracles
reproduce everywhere.
"""

import pytest

from energy_emissions_lakehouse_spark.operators import multimodal as mm


@pytest.mark.skipif(not mm.HAS_PIL, reason="Pillow not installed")
def test_decode_image_with_pil():
    """When PIL is present the decode branch is REAL: a generated PNG
    round-trips to its true dimensions and mode."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 7), color=(1, 2, 3)).save(buf, format="PNG")
    assert mm.decode_image(buf.getvalue()) == (12, 7, "RGB")


@pytest.mark.skipif(mm.HAS_PIL, reason="only without Pillow")
def test_decode_image_raises_cleanly_without_pil():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n")


def test_extract_features_is_deterministic_bytes_path(spark, sf_dir):
    """The registered feature path never depends on PIL availability:
    fingerprints come from md5 over the payload bytes, dims from the
    declared metadata clamp — identical in every environment."""
    from energy_emissions_lakehouse_spark.tables import t

    docs = t(spark, sf_dir, "documents").limit(20)
    feats = mm.extract_features(mm.media_catalog(docs)).collect()
    assert len(feats) == 20
    for r in feats:
        assert r.thumb_w <= mm.THUMB_MAX and r.thumb_h <= mm.THUMB_MAX
        assert r.n_bytes > 0 and r.fingerprint > 0


def test_arrow_and_pandas_feature_paths_agree(spark, sf_dir):
    """mapInArrow and mapInPandas implementations of feature extraction
    must be row-identical — same operator, two Python execution paths."""
    from energy_emissions_lakehouse_spark.operators import multimodal as mm
    from energy_emissions_lakehouse_spark.tables import t

    media = mm.media_catalog(t(spark, sf_dir, "documents"))
    a = mm.extract_features(media)
    b = mm.extract_features_arrow(media)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
