"""Multimodal plumbing: schema, determinism, numpy oracles for the
stubbed codec stages."""

import numpy as np
import pyarrow as pa

from aerial_conversion_ray.config import EngineConfig
from aerial_conversion_ray.pipelines import multimodal
from aerial_conversion_ray.sources.pages import pages_dataset

CFG = EngineConfig(pages_rep=2)


def _html_map(sf_dir):
    t = pa.concat_tables(
        list(
            pages_dataset(sf_dir, rep=CFG.pages_rep, with_html=True).iter_batches(
                batch_size=1 << 16, batch_format="pyarrow"
            )
        )
    )
    return dict(zip(t["page_id"].to_pylist(), t["html"].to_pylist()))


def test_media_meta_matches_lengths(sf_dir):
    html = _html_map(sf_dir)
    meta = multimodal.media_meta(sf_dir, CFG).to_pandas()
    assert len(meta) == len(html)
    for _, row in meta.sample(20, random_state=0).iterrows():
        blen = len(html[row["page_id"]])
        assert row["byte_len"] == blen
        assert row["img_w"] == 64 + blen % 192
        assert row["n_frames"] == blen // multimodal.FRAME_BYTES + 1


def test_decode_stub_oracle(sf_dir):
    html = _html_map(sf_dir)
    dec = multimodal.decode_stub(sf_dir, CFG).to_pandas()
    for _, row in dec.sample(20, random_state=0).iterrows():
        buf = np.frombuffer(html[row["page_id"]], dtype=np.uint8)
        assert row["mean_byte"] == buf.mean()
        assert row["max_byte"] == buf.max()


def test_frame_sample_expansion(sf_dir):
    html = _html_map(sf_dir)
    frames = multimodal.frame_sample(sf_dir, CFG).to_pandas()
    # stride pattern + per-page frame counts
    assert (frames["frame_idx"] % multimodal.FRAME_STRIDE == 0).all()
    per_page = frames.groupby("page_id").size()
    pid = per_page.index[0]
    n_blocks = len(html[pid]) // multimodal.FRAME_BYTES + 1
    want = len(range(0, n_blocks, multimodal.FRAME_STRIDE))
    assert per_page[pid] == want
    # deterministic across runs
    again = multimodal.frame_sample(sf_dir, CFG).to_pandas()
    a = frames.sort_values(["page_id", "frame_idx"]).reset_index(drop=True)
    b = again.sort_values(["page_id", "frame_idx"]).reset_index(drop=True)
    assert a.equals(b)


def test_media_embed_shape_and_determinism(sf_dir):
    emb = multimodal.media_embed_stub(sf_dir, CFG).to_pandas()
    ecols = [f"e{d}" for d in range(multimodal.EMBED_DIM)]
    assert set(ecols) <= set(emb.columns)
    again = multimodal.media_embed_stub(sf_dir, CFG).to_pandas()
    a = emb.sort_values("page_id").reset_index(drop=True)
    b = again.sort_values("page_id").reset_index(drop=True)
    np.testing.assert_array_equal(a[ecols].to_numpy(), b[ecols].to_numpy())


def test_phash_pairs_complete_vs_brute(sf_dir):
    """Banded pair mining must equal the brute-force hamming<=d sweep
    over the per-image hashes (pigeonhole guarantees the candidate
    superset; popcount verify makes it exact), each pair exactly once."""
    import numpy as np

    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.pipelines import multimodal

    cfg = EngineConfig(pages_rep=20)
    ph = multimodal.image_phash(sf_dir, cfg).to_pandas()
    fp = ph["h_lo"].to_numpy(np.int64).astype(np.uint64) | (
        ph["h_hi"].to_numpy(np.int64).astype(np.uint64) << np.uint64(32)
    )
    ids = ph["page_id"].to_numpy(np.int64)
    iu, ju = np.triu_indices(len(ids), k=1)
    x = fp[iu] ^ fp[ju]
    ham = np.zeros(len(x), dtype=np.int64)
    for k in range(64):
        ham += ((x >> np.uint64(k)) & np.uint64(1)).astype(np.int64)
    keep = ham <= multimodal.PHASH_HAM_D
    brute = {
        (min(a, b), max(a, b)): h
        for a, b, h in zip(ids[iu][keep], ids[ju][keep], ham[keep])
    }
    got = multimodal.phash_pairs(sf_dir, cfg).to_pandas()
    assert len(got) == len(brute)  # exactly once each
    for a, b, h in zip(got["a"], got["b"], got["hamming"]):
        assert brute[(a, b)] == h


def test_phash_dhash_semantics(sf_dir):
    """dHash definition check on one decoded image: bit (r,c) set iff
    the 9x8 box-bucket mean at (r,c) exceeds the mean at (r,c+1)."""
    import numpy as np

    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.functions.png import decode_png, encode_png
    from aerial_conversion_ray.pipelines import multimodal

    cfg = EngineConfig(pages_rep=20)
    ph = multimodal.image_phash(sf_dir, cfg).to_pandas().iloc[0]
    pid = int(ph["page_id"])
    w, h = 16 + pid % 8, 12 + pid % 5
    i, j = np.mgrid[0:h, 0:w]
    img = ((pid * 3 + i * 7 + j * 13) % multimodal.PNG_MOD).astype(np.uint8)
    assert (decode_png(encode_png(img)) == img).all()
    means = np.zeros((8, 9))
    for r in range(8):
        for c in range(9):
            rows = (np.arange(h) * 8) // h == r
            cols = (np.arange(w) * 9) // w == c
            means[r, c] = img[np.ix_(rows, cols)].mean()
    bits = (means[:, :8] > means[:, 1:]).flatten()
    w32 = 1 << np.arange(32, dtype=np.uint64)
    assert int((bits[:32] * w32).sum()) == ph["h_lo"]
    assert int((bits[32:] * w32).sum()) == ph["h_hi"]


def test_audio_zcr_matches_direct_synth(sf_dir):
    """ZCR/energy recomputed straight from the synth formula (no WAV
    container round-trip) must match the decode path exactly."""
    import numpy as np

    from aerial_conversion_ray.config import EngineConfig
    from aerial_conversion_ray.pipelines import multimodal

    res = multimodal.audio_zcr(sf_dir, EngineConfig(pages_rep=2)).to_pandas()
    assert len(res) > 0
    for r in res.head(50).itertuples():
        pid = int(r.page_id)
        n = multimodal.WAV_BASE + pid % 64
        t = np.arange(n, dtype=np.int64)
        s = ((pid * 5 + t * 11) % multimodal.WAV_MOD) - multimodal.WAV_MOD // 2
        assert r.zero_crossings == int(np.count_nonzero(s[:-1] * s[1:] < 0))
        assert r.energy == int((s * s).sum())
    assert (res["zero_crossings"] > 0).any()
