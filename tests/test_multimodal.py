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
