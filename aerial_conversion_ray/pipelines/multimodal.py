"""Multimodal (image/audio/video-shaped) stages over opaque binary
columns.

The pages corpus carries ``html: binary`` (the Common-Crawl-style
payload, BASELINE.json ``input_hint``); this module treats it as the
opaque media column and implements the Ray-side plumbing a 100 TB
multimodal pipeline needs — schema, small-batch actor stages, 1->N
frame expansion, typed metadata — with the codec step STUBBED
deterministically (no image/audio libraries exist in this container;
the stub is clearly marked and swap-in ready).

- ``media_meta``    typed metadata per blob (dims / frame count are
                    pure functions of byte length -> SQL-mirrored).
- ``decode_stub``   DETERMINISTIC FAKE DECODE: byte statistics stand
                    in for pixel decoding (rows-only; numpy-checked in
                    tests).  A real deployment replaces ``_decode``
                    with PIL/ffmpeg inside the same actor signature.
- ``frame_sample``  1->N expansion: every ``FRAME_STRIDE``-th
                    256-byte block becomes a "frame" row with a
                    deterministic content hash (flat-map shape, small
                    batch_size for wide payloads).
- ``media_embed_stub`` fake feature vector per blob (batched "model
                    inference" signature: weights built once per
                    actor in ``__init__``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum

from ..config import EngineConfig
from ..sources.pages import pages_dataset
from ..util import pool_size

DEFAULT_CFG = EngineConfig()

FRAME_BYTES = 256
FRAME_STRIDE = 4
EMBED_DIM = 16

# media batches are deliberately small: batch_size x blob_size x
# concurrency must fit a worker heap (SURVEY.md §4 memory pressure)
MEDIA_BATCH = 1024


def _pages_html(sf_dir: str, cfg: EngineConfig) -> ray.data.Dataset:
    return pages_dataset(
        sf_dir, rep=cfg.pages_rep, with_html=True, columns=["page_id", "html"]
    )


def media_meta(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Typed media metadata: dims and frame count as pure functions of
    blob length (SQL-mirrored; the real-codec version would read the
    container header instead)."""

    def meta(t: pa.Table) -> pa.Table:
        blen = pc.binary_length(t["html"]).to_numpy().astype(np.int64)
        return pa.table(
            {
                "page_id": t["page_id"],
                "byte_len": pa.array(blen),
                "img_w": pa.array(64 + blen % 192),
                "img_h": pa.array(64 + (blen // 7) % 192),
                "n_frames": pa.array(blen // FRAME_BYTES + 1),
            }
        )

    return _pages_html(sf_dir, cfg).map_batches(
        meta, batch_format="pyarrow", batch_size=MEDIA_BATCH
    )


def media_meta_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..sources.pages import pages_cte

    return (
        f"with pages as ({pages_cte(cfg.pages_rep)}), "
        "h as (select page_id, cast(octet_length(encode("
        "'<html><head><title>' || cast(doc_id as varchar) || "
        "'</title></head><body>' || text || '</body></html>'"
        ")) as bigint) as byte_len from pages) "
        "select page_id, byte_len, 64 + byte_len % 192 as img_w, "
        "64 + (byte_len // 7) % 192 as img_h, "
        f"byte_len // {FRAME_BYTES} + 1 as n_frames from h"
    )


class DecodeStub:
    """STUB: deterministic fake decoder.  Real codecs (PIL / ffmpeg)
    are not in this container; this actor keeps the production
    signature — heavy init in ``__init__``, per-batch numpy work in
    ``__call__`` — and derives "pixel" statistics from the raw bytes
    so outputs are deterministic and testable."""

    def __init__(self):
        # real version: load codec / model here, once per actor
        self.table = np.arange(256, dtype=np.float64)

    def __call__(self, t: pa.Table) -> pa.Table:
        # STUB for: pixels = Image.open(BytesIO(buf)) ... — byte
        # statistics over the batch's FLAT buffer (zero-copy Arrow,
        # segmented integer cumsum + reduceat; no per-blob Python).
        from .text import _string_buffer

        buf, offs = _string_buffer(t["html"])
        lens = np.diff(offs)  # html wrapper bytes -> every blob nonempty
        csum = np.concatenate([[0], np.cumsum(buf, dtype=np.int64)])
        sums = csum[offs[1:]] - csum[offs[:-1]]
        # integer byte sums are exact in float64, so sums/lens equals
        # numpy's buf.mean() bit-for-bit (the test oracle)
        means = sums / lens
        maxs = np.maximum.reduceat(buf, offs[:-1]).astype(np.int64)
        return pa.table(
            {
                "page_id": t["page_id"],
                "mean_byte": pa.array(means),
                "max_byte": pa.array(maxs),
            }
        )


def decode_stub(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    return _pages_html(sf_dir, cfg).map_batches(
        DecodeStub,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


# --- REAL image decode path (first-party PNG codec, functions/png.py) ---

PNG_MOD = 251


def _png_dims(page_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return 16 + page_id % 8, 12 + page_id % 5  # (w, h)


class PngImageSynth:
    """page -> REAL PNG blob: deterministic grayscale image
    ``v(i, j) = (page_id*3 + i*7 + j*13) % 251`` with page-dependent
    dims.  Pixel synthesis is one vectorized pass over the batch's
    flat pixel space; the per-blob ``zlib`` deflate inside
    ``encode_png`` is the codec's inherent C-speed call (what PIL does
    per image)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.png import encode_png

        pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w, h = _png_dims(pid)
        npx = w * h
        total = int(npx.sum())
        blob = np.repeat(np.arange(len(pid)), npx)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(npx) - npx, npx
        )
        i = within // w[blob]
        j = within % w[blob]
        v = ((pid[blob] * 3 + i * 7 + j * 13) % PNG_MOD).astype(np.uint8)
        offs = np.concatenate([[0], np.cumsum(npx)])
        blobs = [
            encode_png(v[offs[k] : offs[k + 1]].reshape(h[k], w[k]))
            for k in range(len(pid))
        ]
        return pa.table(
            {"page_id": t["page_id"], "png": pa.array(blobs, pa.binary())}
        )


class PngDecode:
    """REAL decoder actor: parses PNG chunks, inflates IDAT, unfilters
    scanlines (``functions/png.py``) — the swap-in the DecodeStub
    advertised, exercised end-to-end.  Same production shape: codec
    state in ``__init__``, per-batch work in ``__call__``, small
    batches for wide payloads."""

    def __init__(self):
        from ..functions import png

        self.decode = png.decode_png  # symbol resolved once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        pid = t["page_id"]
        col = t["png"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ws, hs, sums, maxs = [], [], [], []
        for buf in col:
            img = self.decode(buf.as_py())
            hs.append(img.shape[0])
            ws.append(img.shape[1])
            sums.append(int(img.sum(dtype=np.int64)))
            maxs.append(int(img.max()))
        return pa.table(
            {
                "page_id": pid,
                "img_w": pa.array(ws, pa.int64()),
                "img_h": pa.array(hs, pa.int64()),
                "px_sum": pa.array(sums, pa.int64()),
                "max_byte": pa.array(maxs, pa.int64()),
            }
        )


def media_decode(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Real image decode over a binary media column: synthesize
    genuine PNG bytes per page, decode them back with the first-party
    codec, emit integer pixel stats (SQL-mirrored closed form —
    upgraded from the r1/r2 rows-only stub)."""
    ds = pages_dataset(sf_dir, rep=cfg.pages_rep, columns=["page_id"])
    ds = ds.map_batches(PngImageSynth(), batch_format="pyarrow", batch_size=MEDIA_BATCH)
    return ds.map_batches(
        PngDecode,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


def media_decode_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..sources.pages import pages_cte

    return (
        f"with pages as ({pages_cte(cfg.pages_rep)}), "
        "dims as (select page_id, 16 + page_id % 8 as w, 12 + page_id % 5 as h "
        "from pages), "
        "px as (select page_id, w, h, "
        f"((page_id * 3 + i.v * 7 + j.v * 13) % {PNG_MOD}) as v "
        "from dims, unnest(range(h)) i(v), unnest(range(w)) j(v)) "
        "select page_id, w as img_w, h as img_h, "
        "cast(sum(v) as bigint) as px_sum, cast(max(v) as bigint) as max_byte "
        "from px group by page_id, w, h"
    )


def frame_sample(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """1->N frame expansion: every FRAME_STRIDE-th FRAME_BYTES block
    of the blob becomes a frame row with a deterministic polynomial
    content hash (video frame-sampling plumbing; the real version
    decodes actual frames inside the same expansion shape)."""

    def expand(t: pa.Table) -> pa.Table:
        from .text import _poly_hash_segments, _string_buffer

        buf, offs = _string_buffer(t["html"])
        pids = t["page_id"].to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        n_blocks = lens // FRAME_BYTES + 1
        q = -(-n_blocks // FRAME_STRIDE)  # frames per blob (ceil)
        total = int(q.sum())
        blob = np.repeat(np.arange(len(pids)), q)
        within = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(q)[:-1]]), q
        )
        fi = within * FRAME_STRIDE
        starts = offs[:-1][blob] + fi * FRAME_BYTES
        ends = np.minimum(starts + FRAME_BYTES, offs[1:][blob])
        # gather the (non-adjacent) frame byte ranges into one flat
        # buffer, then one segmented polynomial hash — no per-frame
        # Python, no per-byte loop
        seg_len = ends - starts
        g_offs = np.concatenate([[0], np.cumsum(seg_len)])
        pos = np.arange(int(seg_len.sum())) - np.repeat(g_offs[:-1], seg_len)
        gathered = buf[np.repeat(starts, seg_len) + pos]
        hashes = _poly_hash_segments(gathered, g_offs)
        return pa.table(
            {
                "page_id": pa.array(pids[blob]),
                "frame_idx": pa.array(fi.astype(np.int64)),
                "frame_hash": pa.array(hashes.astype(np.int64)),
            }
        )

    return _pages_html(sf_dir, cfg).map_batches(
        expand, batch_format="pyarrow", batch_size=MEDIA_BATCH
    )


class MediaEmbedStub:
    """STUB batched "model inference": a fixed random projection of
    byte histograms stands in for a vision encoder.  Weights built
    ONCE per actor (the model-load pattern); per batch one matmul."""

    def __init__(self, dim: int = EMBED_DIM):
        rng = np.random.default_rng(4242)
        self.w = rng.standard_normal((256, dim))

    def __call__(self, t: pa.Table) -> pa.Table:
        from .text import _string_buffer

        buf, offs = _string_buffer(t["html"])
        lens = np.diff(offs)
        n = len(lens)
        blob = np.repeat(np.arange(n, dtype=np.int64), lens)
        # per-blob byte histogram in ONE bincount over (blob, byte) keys
        flat = np.bincount(blob * 256 + buf, minlength=n * 256)
        hist = flat.reshape(n, 256).astype(np.float64) / np.maximum(lens, 1)[:, None]
        emb = hist @ self.w
        # scalar columns (e0..e15) rather than list<float>: the
        # driver's value-hash canonicalization sorts rows by every
        # column, and list columns are unhashable there.  Production
        # schema note: a real encoder would emit list<float32> like
        # the embeddings table.
        cols = {"page_id": t["page_id"]}
        for d in range(emb.shape[1]):
            cols[f"e{d}"] = pa.array(emb[:, d])
        return pa.table(cols)


def media_embed_stub(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    return _pages_html(sf_dir, cfg).map_batches(
        MediaEmbedStub,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


# --------------------------------------------------------------------------
# S8: media bytes + bounds -> georeferenced GeoTIFF on disk -> read-back
# --------------------------------------------------------------------------

GEOTIFF_MOD = 97                      # 1 page in 97 exports a file
GEOTIFF_DIR = "/tmp/aerial_conversion_png2gtiff"


def png_to_geotiff(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """The reference's JPEG->GeoTIFF georeferencing
    (``scripts/jpeg2tiff.py`` semantics: image bytes + corner bounds ->
    north-up affine -> georeferenced raster on disk), end-to-end REAL:
    synthesize genuine PNG bytes per sampled page, decode them with the
    first-party codec, derive the affine from the page's footprint
    (x0 = fp_minx, y_max = fp_maxy, square cell = x-extent / width —
    the reference's bounds-to-transform), write an actual GeoTIFF via
    ``sources/geotiff.write_geotiff`` (atomic tmp+rename: re-runs are
    idempotent, the resume story of ``state/lineage``), then READ THE
    FILE BACK through ``read_info``/``read_window`` and emit pixel
    stats + the round-tripped georeferencing in fixed point.

    Per-row Python is correct here: each row IS a whole file (one
    open/write/rename/parse per exported raster, the same shape as the
    lineage writer); the pixel math inside stays numpy.  The export is
    page_id-sampled (1/{mod}) so the bench writes dozens of files, not
    millions — a production export lifts the mod and partitions the
    output directory by tile, unchanged code."""
    from .spatial import geocode_pipeline
    from ..config import RasterSpec
    from ..sources.geotiff import read_info, read_window, write_geotiff

    ds = geocode_pipeline(sf_dir, cfg).select_columns(
        ["page_id", "fp_minx", "fp_maxx", "fp_maxy"]
    )

    class Export:
        def __init__(self):
            import os

            from ..functions.png import decode_png, encode_png

            self.enc, self.dec = encode_png, decode_png
            os.makedirs(GEOTIFF_DIR, exist_ok=True)

        def __call__(self, t: pa.Table) -> pa.Table:
            import os

            pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = pid % GEOTIFF_MOD == 0
            if not keep.any():
                return pa.table(
                    {
                        "page_id": pa.array([], pa.int64()),
                        "img_w": pa.array([], pa.int64()),
                        "img_h": pa.array([], pa.int64()),
                        "px_sum": pa.array([], pa.int64()),
                        "max_byte": pa.array([], pa.int64()),
                        "x0_e9": pa.array([], pa.int64()),
                        "ymax_e9": pa.array([], pa.int64()),
                        "cell_e9": pa.array([], pa.int64()),
                    }
                )
            sub = t.filter(pa.array(keep))
            pids = sub["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            x0s = sub["fp_minx"].to_numpy(zero_copy_only=False)
            x1s = sub["fp_maxx"].to_numpy(zero_copy_only=False)
            y1s = sub["fp_maxy"].to_numpy(zero_copy_only=False)
            ws, hs = _png_dims(pids)
            out = {k: [] for k in (
                "page_id", "img_w", "img_h", "px_sum", "max_byte",
                "x0_e9", "ymax_e9", "cell_e9",
            )}
            for p, w, h, x0, x1, y1 in zip(pids, ws, hs, x0s, x1s, y1s):
                i = np.arange(int(h), dtype=np.int64)[:, None]
                j = np.arange(int(w), dtype=np.int64)[None, :]
                img = ((int(p) * 3 + i * 7 + j * 13) % PNG_MOD).astype(np.uint8)
                arr = self.dec(self.enc(img))          # real codec roundtrip
                cell = (float(x1) - float(x0)) / int(w)
                spec = RasterSpec(
                    x0=float(x0), y_max=float(y1), cell=cell,
                    ncols=int(w), nrows=int(h),
                )
                path = f"{GEOTIFF_DIR}/page_{int(p)}.tif"
                tmp = f"{path}.{os.getpid()}"
                write_geotiff(tmp, arr, spec, rows_per_strip=8)
                os.replace(tmp, path)
                info = read_info(path)                 # read the BYTES back
                back = read_window(path, info, 0, 0, int(w), int(h))
                out["page_id"].append(int(p))
                out["img_w"].append(info.width)
                out["img_h"].append(info.height)
                out["px_sum"].append(int(back.sum(dtype=np.int64)))
                out["max_byte"].append(int(back.max()))
                out["x0_e9"].append(
                    int(np.floor(info.raster.x0 * 1e9 + 0.5))
                )
                out["ymax_e9"].append(
                    int(np.floor(info.raster.y_max * 1e9 + 0.5))
                )
                out["cell_e9"].append(
                    int(np.floor(info.raster.cell * 1e9 + 0.5))
                )
            return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    return ds.map_batches(
        Export, batch_format="pyarrow", batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


def png_to_geotiff_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from .sql_oracle import _pages_geo

    return (
        f"{_pages_geo(cfg)}, "
        f"picked as (select page_id, fp_minx, fp_maxx, fp_maxy, "
        f"16 + page_id % 8 as w, 12 + page_id % 5 as h "
        f"from geo where page_id % {GEOTIFF_MOD} = 0), "
        f"px as (select page_id, w, h, "
        f"((page_id * 3 + i.v * 7 + j.v * 13) % {PNG_MOD}) as v "
        "from picked, unnest(range(h)) i(v), unnest(range(w)) j(v)) "
        "select px.page_id, px.w as img_w, px.h as img_h, "
        "cast(sum(px.v) as bigint) as px_sum, "
        "cast(max(px.v) as bigint) as max_byte, "
        "cast(floor(p.fp_minx * 1000000000.0 + 0.5) as bigint) as x0_e9, "
        "cast(floor(p.fp_maxy * 1000000000.0 + 0.5) as bigint) as ymax_e9, "
        "cast(floor(((p.fp_maxx - p.fp_minx) / p.w) * 1000000000.0 + 0.5) as bigint)"
        " as cell_e9 "
        "from px join picked p using (page_id) "
        "group by px.page_id, px.w, px.h, p.fp_minx, p.fp_maxy, p.fp_maxx, p.w"
    )


# --------------------------------------------------------------------------
# real audio decode (first-party WAV codec; upgrades the byte-stats stub)
# --------------------------------------------------------------------------

WAV_MOD = 2048
WAV_BASE = 200


class WavSynth:
    """page -> REAL WAV blob: deterministic mono PCM16 stream
    ``s(t) = ((page_id*5 + t*11) % 2048) - 1024`` with page-dependent
    length (the audio analog of ``PngImageSynth``)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..functions.wav import encode_wav

        pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = WAV_BASE + pid % 64
        total = int(n.sum())
        blob = np.repeat(np.arange(len(pid)), n)
        tpos = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(n) - n, n)
        s = (((pid[blob] * 5 + tpos * 11) % WAV_MOD) - WAV_MOD // 2).astype(np.int16)
        offs = np.concatenate([[0], np.cumsum(n)])
        blobs = [
            encode_wav(s[offs[k] : offs[k + 1]]) for k in range(len(pid))
        ]
        return pa.table(
            {"page_id": t["page_id"], "wav": pa.array(blobs, pa.binary())}
        )


class WavDecode:
    """REAL decoder actor: chunk-walks RIFF, validates PCM16, returns
    integer sample stats (``functions/wav.py``) — the audio stub's
    advertised swap-in, exercised end-to-end."""

    def __init__(self):
        from ..functions import wav

        self.decode = wav.decode_wav

    def __call__(self, t: pa.Table) -> pa.Table:
        pid = t["page_id"]
        col = t["wav"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ns, sums, maxs, peaks = [], [], [], []
        for buf in col:
            arr, _rate = self.decode(buf.as_py())
            a = arr[:, 0].astype(np.int64)
            ns.append(len(a))
            sums.append(int(a.sum()))
            maxs.append(int(a.max()))
            peaks.append(int(np.abs(a).max()))
        return pa.table(
            {
                "page_id": pid,
                "n_samples": pa.array(ns, pa.int64()),
                "sum_s": pa.array(sums, pa.int64()),
                "max_s": pa.array(maxs, pa.int64()),
                "peak": pa.array(peaks, pa.int64()),
            }
        )


def audio_decode(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Real audio decode over a binary media column: synthesize genuine
    WAV bytes per page, decode them back with the first-party RIFF
    parser, emit integer sample stats (SQL-mirrored closed form) —
    upgrades the audio half of the byte-stats stub the way
    ``media_decode`` upgraded the image half."""
    ds = pages_dataset(sf_dir, rep=cfg.pages_rep, columns=["page_id"])
    ds = ds.map_batches(WavSynth(), batch_format="pyarrow", batch_size=MEDIA_BATCH)
    return ds.map_batches(
        WavDecode,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


def audio_decode_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..sources.pages import pages_cte

    return (
        f"with pages as ({pages_cte(cfg.pages_rep)}), "
        f"dims as (select page_id, {WAV_BASE} + page_id % 64 as n from pages), "
        f"smp as (select page_id, n, "
        f"((page_id * 5 + t.v * 11) % {WAV_MOD}) - {WAV_MOD // 2} as s "
        "from dims, unnest(range(n)) t(v)) "
        "select page_id, cast(n as bigint) as n_samples, "
        "cast(sum(s) as bigint) as sum_s, cast(max(s) as bigint) as max_s, "
        "cast(max(abs(s)) as bigint) as peak "
        "from smp group by page_id, n"
    )


# --------------------------------------------------------------------------
# real video frame sampling (first-party frame container + PNG frames)
# --------------------------------------------------------------------------

VID_MAGIC = b"AVSQ"
VID_STRIDE = 2


def _vid_frames_per_page(pid: np.ndarray) -> np.ndarray:
    return 2 + pid % 3


class VideoSynth:
    """page -> REAL frame-sequence blob: a minimal first-party
    container (magic, u32 frame count, u32 offset table) holding
    genuine PNG frames — frame f's pixels are
    ``(page_id*3 + f*17 + i*7 + j*13) % 251`` at the page's PNG dims.
    No ffmpeg exists in this environment; the container is honest
    first-party structure (like the GeoTIFF writer), the frames are
    real PNGs."""

    def __call__(self, t: pa.Table) -> pa.Table:
        import struct

        from ..functions.png import encode_png

        pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ws, hs = _png_dims(pid)
        nf = _vid_frames_per_page(pid)
        blobs = []
        for p, w, h, f_cnt in zip(pid, ws, hs, nf):
            i = np.arange(int(h), dtype=np.int64)[:, None]
            j = np.arange(int(w), dtype=np.int64)[None, :]
            frames = [
                encode_png(
                    ((int(p) * 3 + f * 17 + i * 7 + j * 13) % PNG_MOD).astype(
                        np.uint8
                    )
                )
                for f in range(int(f_cnt))
            ]
            head = VID_MAGIC + struct.pack("<I", len(frames))
            offs, pos = [], len(head) + 4 * len(frames)
            for fr in frames:
                offs.append(pos)
                pos += len(fr)
            blobs.append(
                head + b"".join(struct.pack("<I", o) for o in offs) + b"".join(frames)
            )
        return pa.table(
            {"page_id": t["page_id"], "video": pa.array(blobs, pa.binary())}
        )


class VideoFrameDecode:
    """REAL frame sampler: parse the container index, decode every
    ``VID_STRIDE``-th frame with the first-party PNG codec, one row per
    sampled frame (the 1->N explode of ``frame_sample`` with genuine
    decode instead of byte hashing)."""

    def __init__(self):
        from ..functions import png

        self.decode = png.decode_png

    def __call__(self, t: pa.Table) -> pa.Table:
        import struct

        pid = t["page_id"]
        col = t["video"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        pids, fidx, sums, maxs = [], [], [], []
        for p, buf in zip(pid.to_numpy(zero_copy_only=False), col):
            raw = buf.as_py()
            if raw[:4] != VID_MAGIC:
                raise ValueError("bad frame container")
            (n,) = struct.unpack("<I", raw[4:8])
            offs = struct.unpack(f"<{n}I", raw[8 : 8 + 4 * n])
            ends = list(offs[1:]) + [len(raw)]
            for f in range(0, n, VID_STRIDE):
                img = self.decode(raw[offs[f] : ends[f]])
                pids.append(int(p))
                fidx.append(f)
                sums.append(int(img.sum(dtype=np.int64)))
                maxs.append(int(img.max()))
        return pa.table(
            {
                "page_id": pa.array(pids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "px_sum": pa.array(sums, pa.int64()),
                "max_byte": pa.array(maxs, pa.int64()),
            }
        )


def video_frames(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Real video-style frame sampling over a binary media column:
    first-party frame container in, every ``VID_STRIDE``-th frame
    decoded through the real PNG codec, per-frame pixel stats out
    (SQL-mirrored closed form) — upgrades the last codec stub family
    (``frame_sample`` keeps the byte-hash plumbing variant)."""
    ds = pages_dataset(sf_dir, rep=cfg.pages_rep, columns=["page_id"])
    ds = ds.map_batches(VideoSynth(), batch_format="pyarrow", batch_size=MEDIA_BATCH)
    return ds.map_batches(
        VideoFrameDecode,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


def video_frames_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..sources.pages import pages_cte

    return (
        f"with pages as ({pages_cte(cfg.pages_rep)}), "
        "dims as (select page_id, 16 + page_id % 8 as w, 12 + page_id % 5 as h, "
        "2 + page_id % 3 as nf from pages), "
        f"fr as (select page_id, w, h, f.v as frame_idx from dims, "
        f"unnest(range(nf)) f(v) where f.v % {VID_STRIDE} = 0), "
        f"px as (select page_id, frame_idx, w, h, "
        f"((page_id * 3 + frame_idx * 17 + i.v * 7 + j.v * 13) % {PNG_MOD}) as v "
        "from fr, unnest(range(h)) i(v), unnest(range(w)) j(v)) "
        "select page_id, frame_idx, cast(sum(v) as bigint) as px_sum, "
        "cast(max(v) as bigint) as max_byte "
        "from px group by page_id, frame_idx, w, h"
    )


# --------------------------------------------------------------------------
# real JPEG decode (first-party baseline codec, functions/jpeg.py) — the
# reference's actual input format (scripts/jpeg2tiff.py:15-105)
# --------------------------------------------------------------------------

JPEG_Q = 90
JPEG_RST = 2          # exercise DRI/RSTn on every engine-produced blob
# provable tolerance: the synth image family is periodic in page_id
# with period lcm(8, 5, 251) = 10040; an exhaustive sweep over ALL
# residues measured max |decoded - original| = 15 at quality 90, so 24
# holds for every page_id at any scale (not a sampled guess)
JPEG_TOL = 24


class JpegImageSynth:
    """page -> REAL JPEG blob: the same deterministic grayscale image
    family as ``PngImageSynth`` (``(page_id*3 + i*7 + j*13) % 251``),
    baseline-encoded at quality {JPEG_Q} with a restart interval —
    genuine SOI/DQT/SOF0/DHT/DRI/SOS streams on the binary column."""

    def __init__(self):
        from ..functions.jpeg import encode_jpeg

        self.enc = encode_jpeg

    def __call__(self, t: pa.Table) -> pa.Table:
        pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ws, hs = _png_dims(pid)
        blobs = []
        for p, w, h in zip(pid, ws, hs):
            i = np.arange(int(h), dtype=np.int64)[:, None]
            j = np.arange(int(w), dtype=np.int64)[None, :]
            img = ((int(p) * 3 + i * 7 + j * 13) % PNG_MOD).astype(np.uint8)
            blobs.append(self.enc(img, quality=JPEG_Q, restart_interval=JPEG_RST))
        return pa.table(
            {"page_id": t["page_id"], "jpeg": pa.array(blobs, pa.binary())}
        )


class JpegDecode:
    """REAL decoder actor: full baseline parse (DQT/SOF0/DHT/DRI/RST,
    Huffman entropy decode, vectorized dequant + IDCT) — JPEG is
    lossy, so instead of raw pixel sums the stage emits dims plus an
    ``ok`` flag asserting the decode landed within the PROVEN error
    bound of the original image (re-synthesized from page_id inside
    the actor).  ``ok`` is closed-form true for every page, which is
    what makes the lossy codec SQL-oracle-checkable."""

    def __init__(self):
        from ..functions import jpeg

        self.decode = jpeg.decode_jpeg

    def __call__(self, t: pa.Table) -> pa.Table:
        pid = t["page_id"]
        col = t["jpeg"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ws, hs, oks = [], [], []
        for p, buf in zip(
            pid.to_numpy(zero_copy_only=False).astype(np.int64), col
        ):
            img = self.decode(buf.as_py())
            h, w = img.shape
            i = np.arange(h, dtype=np.int64)[:, None]
            j = np.arange(w, dtype=np.int64)[None, :]
            orig = ((int(p) * 3 + i * 7 + j * 13) % PNG_MOD).astype(np.int64)
            err = int(np.abs(img.astype(np.int64) - orig).max())
            ws.append(w)
            hs.append(h)
            oks.append(err <= JPEG_TOL)
        return pa.table(
            {
                "page_id": pid,
                "img_w": pa.array(ws, pa.int64()),
                "img_h": pa.array(hs, pa.int64()),
                "ok": pa.array(oks, pa.bool_()),
            }
        )


def jpeg_decode(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Real JPEG decode over a binary media column: genuine baseline
    JFIF bytes per page (first-party encoder), decoded back with the
    first-party decoder, dims + proven-bound ``ok`` out (the lossy
    analog of ``media_decode``; reference input format per
    ``scripts/jpeg2tiff.py``)."""
    ds = pages_dataset(sf_dir, rep=cfg.pages_rep, columns=["page_id"])
    ds = ds.map_batches(
        JpegImageSynth(), batch_format="pyarrow", batch_size=MEDIA_BATCH
    )
    return ds.map_batches(
        JpegDecode,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


def jpeg_decode_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..sources.pages import pages_cte

    return (
        f"with pages as ({pages_cte(cfg.pages_rep)}) "
        "select page_id, 16 + page_id % 8 as img_w, "
        "12 + page_id % 5 as img_h, true as ok from pages"
    )


def jpeg_to_geotiff(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """The reference's JPEG->GeoTIFF export (``scripts/jpeg2tiff.py``:
    JPEG bytes + corner bounds -> north-up affine -> georeferenced
    raster on disk), now with the REAL input format end-to-end: encode
    a genuine baseline JPEG per sampled page, decode it with the
    first-party codec, write the DECODED pixels as a GeoTIFF
    (atomic tmp+rename), read the file back, and emit the
    round-tripped georeferencing in fixed point plus two flags:
    ``lossless_tiff`` (TIFF readback == decoded array, bit-exact) and
    ``ok`` (decoded within the proven JPEG error bound).  Same
    per-row-is-a-file shape and 1/{GEOTIFF_MOD} page sampling as
    ``png_to_geotiff``."""
    from ..config import RasterSpec
    from ..sources.geotiff import read_info, read_window, write_geotiff
    from .spatial import geocode_pipeline

    ds = geocode_pipeline(sf_dir, cfg).select_columns(
        ["page_id", "fp_minx", "fp_maxx", "fp_maxy"]
    )

    class Export:
        def __init__(self):
            import os

            from ..functions.jpeg import decode_jpeg, encode_jpeg

            self.enc, self.dec = encode_jpeg, decode_jpeg
            os.makedirs(GEOTIFF_DIR, exist_ok=True)

        def __call__(self, t: pa.Table) -> pa.Table:
            import os

            pid = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = pid % GEOTIFF_MOD == 0
            cols = (
                "page_id", "img_w", "img_h", "ok", "lossless_tiff",
                "x0_e9", "ymax_e9", "cell_e9",
            )
            if not keep.any():
                return pa.table(
                    {
                        k: pa.array(
                            [], pa.bool_() if k in ("ok", "lossless_tiff")
                            else pa.int64()
                        )
                        for k in cols
                    }
                )
            sub = t.filter(pa.array(keep))
            pids = sub["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            x0s = sub["fp_minx"].to_numpy(zero_copy_only=False)
            x1s = sub["fp_maxx"].to_numpy(zero_copy_only=False)
            y1s = sub["fp_maxy"].to_numpy(zero_copy_only=False)
            ws, hs = _png_dims(pids)
            out = {k: [] for k in cols}
            for p, w, h, x0, x1, y1 in zip(pids, ws, hs, x0s, x1s, y1s):
                i = np.arange(int(h), dtype=np.int64)[:, None]
                j = np.arange(int(w), dtype=np.int64)[None, :]
                img = ((int(p) * 3 + i * 7 + j * 13) % PNG_MOD).astype(np.uint8)
                dec = self.dec(
                    self.enc(img, quality=JPEG_Q, restart_interval=JPEG_RST)
                )
                cell = (float(x1) - float(x0)) / int(w)
                spec = RasterSpec(
                    x0=float(x0), y_max=float(y1), cell=cell,
                    ncols=int(w), nrows=int(h),
                )
                path = f"{GEOTIFF_DIR}/jpage_{int(p)}.tif"
                tmp = f"{path}.{os.getpid()}"
                write_geotiff(tmp, dec, spec, rows_per_strip=8)
                os.replace(tmp, path)
                info = read_info(path)
                back = read_window(path, info, 0, 0, int(w), int(h))
                err = int(np.abs(dec.astype(np.int64) - img.astype(np.int64)).max())
                out["page_id"].append(int(p))
                out["img_w"].append(info.width)
                out["img_h"].append(info.height)
                out["ok"].append(err <= JPEG_TOL)
                out["lossless_tiff"].append(bool(np.array_equal(back, dec)))
                out["x0_e9"].append(int(np.floor(info.raster.x0 * 1e9 + 0.5)))
                out["ymax_e9"].append(int(np.floor(info.raster.y_max * 1e9 + 0.5)))
                out["cell_e9"].append(int(np.floor(info.raster.cell * 1e9 + 0.5)))
            return pa.table(
                {
                    k: pa.array(
                        v, pa.bool_() if k in ("ok", "lossless_tiff") else pa.int64()
                    )
                    for k, v in out.items()
                }
            )

    return ds.map_batches(
        Export, batch_format="pyarrow", batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


def jpeg_to_geotiff_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from .sql_oracle import _pages_geo

    return (
        f"{_pages_geo(cfg)} "
        "select page_id, 16 + page_id % 8 as img_w, 12 + page_id % 5 as img_h, "
        "true as ok, true as lossless_tiff, "
        "cast(floor(fp_minx * 1000000000.0 + 0.5) as bigint) as x0_e9, "
        "cast(floor(fp_maxy * 1000000000.0 + 0.5) as bigint) as ymax_e9, "
        "cast(floor(((fp_maxx - fp_minx) / (16 + page_id % 8)) * 1000000000.0 + 0.5)"
        " as bigint) as cell_e9 "
        f"from geo where page_id % {GEOTIFF_MOD} = 0"
    )


# --------------------------------------------------------------------------
# media feature extraction over REAL decoded pixels (SQL-mirrored)
# --------------------------------------------------------------------------

EMBED_BINS = 16


class PngFeatures:
    """Classical image features from REAL decoded pixels: the
    first-party PNG codec decodes each blob, then a 16-bin intensity
    histogram + integer pixel moments form the feature row — the
    'vision encoder' slot upgraded from the r2/r3 byte-histogram STUB
    to features of the actual IMAGE content, with an exact SQL oracle
    (the synthesized pixel function is closed-form, so DuckDB can
    re-derive every bin count without any codec).

    Same production shape as PngDecode: codec bound once per actor,
    per-batch decode loop is per-IMAGE (inherent — each blob is an
    independent compressed stream), per-image math vectorized."""

    def __init__(self):
        from ..functions import png

        self.decode = png.decode_png

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t["png"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = t.num_rows
        bins = np.zeros((n, EMBED_BINS), dtype=np.int64)
        s1 = np.zeros(n, dtype=np.int64)
        s2 = np.zeros(n, dtype=np.int64)
        npx = np.zeros(n, dtype=np.int64)
        width = 256 // EMBED_BINS
        for k, buf in enumerate(col):
            img = self.decode(buf.as_py()).astype(np.int64)
            bins[k] = np.bincount(
                np.minimum(img.ravel() // width, EMBED_BINS - 1),
                minlength=EMBED_BINS,
            )
            s1[k] = img.sum()
            s2[k] = (img * img).sum()
            npx[k] = img.size
        cols = {"page_id": t["page_id"], "n_px": pa.array(npx),
                "px_sum": pa.array(s1), "px_sq_sum": pa.array(s2)}
        for b in range(EMBED_BINS):
            cols[f"b{b}"] = pa.array(bins[:, b])
        return pa.table(cols)


def media_embed(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """page -> real-PNG synth -> REAL decode -> 16-bin intensity
    histogram + exact moments (the feature-extraction stage of an
    image pipeline, actor-pool shaped)."""
    ds = pages_dataset(sf_dir, rep=cfg.pages_rep, columns=["page_id"])
    ds = ds.map_batches(PngImageSynth(), batch_format="pyarrow", batch_size=MEDIA_BATCH)
    return ds.map_batches(
        PngFeatures,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


def media_embed_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..sources.pages import pages_cte

    width = 256 // EMBED_BINS
    bin_cols = ", ".join(
        f"cast(count(*) filter (least(v // {width}, {EMBED_BINS - 1}) = {b}) as bigint) as b{b}"
        for b in range(EMBED_BINS)
    )
    return (
        f"with pages as ({pages_cte(cfg.pages_rep)}), "
        "dims as (select page_id, 16 + page_id % 8 as w, 12 + page_id % 5 as h "
        "from pages), "
        "px as (select page_id, w, h, "
        f"((page_id * 3 + i.v * 7 + j.v * 13) % {PNG_MOD}) as v "
        "from dims, unnest(range(h)) i(v), unnest(range(w)) j(v)) "
        "select page_id, cast(w * h as bigint) as n_px, "
        "cast(sum(v) as bigint) as px_sum, cast(sum(v * v) as bigint) as px_sq_sum, "
        f"{bin_cols} "
        "from px group by page_id, w, h"
    )


def media_byte_stats_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    """Exact DuckDB mirror of :class:`DecodeStub`: the html payload is
    ASCII by construction, so per-page byte stats are char-code stats
    (ord over an unnested position range).  Upgrades the entry from
    rows-only to an exact oracle; the class itself remains the
    documented stand-in shape for absent third-party codecs."""
    from ..sources.pages import pages_cte

    return (
        f"with pages as ({pages_cte(cfg.pages_rep)}), "
        "h as (select page_id, '<html><head><title>' || cast(doc_id as varchar) "
        "|| '</title></head><body>' || text || '</body></html>' as html from pages), "
        "b as (select page_id, ord(substr(html, i.v + 1, 1)) as o "
        "from h, unnest(range(length(html))) i(v)) "
        "select page_id, sum(o) / count(*) as mean_byte, "
        "cast(max(o) as bigint) as max_byte from b group by page_id"
    )


# --------------------------------------------------------------------------
# heatmap rasterize: per-cell page density -> real GeoTIFF -> windowed read
# --------------------------------------------------------------------------

HEATMAP_RES = 9           # 512 x 256 px world raster (one px per res-9 cell)
HEATMAP_TILE = 128
HEATMAP_DIR = "/tmp/aerial_conversion_heatmap"


def heatmap_geotiff(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CFG, res: int = HEATMAP_RES
) -> ray.data.Dataset:
    """The full rasterize loop: geocoded pages -> EXACT per-cell counts
    -> a real uint8 density GeoTIFF on disk (first-party writer,
    atomic tmp+rename) -> read BACK through the windowed strip-range
    reader as one row per tile window with its pixel sum.  The
    vector->raster direction of the engine's raster story (the
    reference's rasterize analog next to raster_windows' read side).

    Scale shape: counts come from the streaming coarse fold (exact,
    sparse).  The DENSE raster assembly is collected on the driver by
    construction — bounded by the GRID (2^res * 2^(res-1) px = 128 Kpx
    here), never by the corpus; a higher-res export would shard the
    write per tile row through the lineage writer, same code shape.
    Pixel law: v = min(count, 255); empty cells 0.  The read-back
    dataset streams per-window strip ranges (never the whole file) and
    includes EMPTY tiles with px_sum 0 — the oracle mirrors that with
    a generated tile table."""
    import os

    from .spatial import geocode_pipeline
    from ..config import RasterSpec, TileGridSpec
    from ..geo import cells
    from ..sources.geotiff import read_raster_windows, write_geotiff

    n_side = 1 << res
    counts = geocode_pipeline(sf_dir, cfg, columns=["page_id"])

    def cell_partial(t: pa.Table) -> pa.Table:
        cell = cells.encode(t["lon"].to_numpy(), t["lat"].to_numpy(), res)
        u, c = np.unique(cell, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(u),
                "n": pa.array(c.astype(np.int64)),
                "bucket": pa.array((u % 64).astype(np.int64)),
            }
        )

    def fold(df):
        g = df.groupby("cell", as_index=False)["n"].sum()
        return g[["cell", "n"]].astype(np.int64)

    occ = (
        counts.map_batches(cell_partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    img = np.zeros((n_side // 2, n_side), dtype=np.uint8)
    c = occ["cell"].to_numpy(np.int64)
    iy, ix = c // n_side, c % n_side
    img[(n_side // 2 - 1) - iy, ix] = np.minimum(
        occ["n"].to_numpy(np.int64), 255
    ).astype(np.uint8)
    spec = RasterSpec(
        x0=-180.0, y_max=90.0, cell=360.0 / n_side, ncols=n_side, nrows=n_side // 2
    )
    os.makedirs(HEATMAP_DIR, exist_ok=True)
    path = f"{HEATMAP_DIR}/heatmap_r{res}_{cfg.pages_rep}.tif"
    tmp = f"{path}.{os.getpid()}"
    write_geotiff(tmp, img, spec, rows_per_strip=32)
    os.replace(tmp, path)

    grid = TileGridSpec(tile_width=HEATMAP_TILE, tile_height=HEATMAP_TILE)
    return read_raster_windows(path, grid).select_columns(
        ["tile_id", "col_off", "row_off", "width", "height", "px_sum"]
    )


def heatmap_geotiff_sql(cfg: EngineConfig = DEFAULT_CFG, res: int = HEATMAP_RES) -> str:
    from .sql_oracle import _pages_geo
    from ..geo import cells

    n = 1 << res
    t = HEATMAP_TILE
    cell = cells.sql_expr("lon", "lat", res)
    return (
        _pages_geo(cfg)
        + f""",
cellt as (select {cell} as cell from geo),
cnt as (select cell, count(*) as n from cellt group by cell),
px as (select cell % {n} as ix, ({n // 2 - 1}) - (cell // {n}) as iy,
              least(n, 255) as v from cnt),
sums as (select (ix // {t}) * {t} as col_off, (iy // {t}) * {t} as row_off,
                sum(v) as s from px group by 1, 2),
tiles as (select cx.v as col_off, ry.v as row_off from
  (select unnest(range(0, {n}, {t})) as v) cx,
  (select unnest(range(0, {n // 2}, {t})) as v) ry)
select ('tile_' || cast(tiles.col_off as varchar) || '-' ||
        cast(tiles.row_off as varchar)) as tile_id,
       cast(tiles.col_off as bigint) as col_off,
       cast(tiles.row_off as bigint) as row_off,
       cast({t} as bigint) as width, cast({t} as bigint) as height,
       cast(coalesce(s, 0) as bigint) as px_sum
from tiles left join sums
  on sums.col_off = tiles.col_off and sums.row_off = tiles.row_off
"""
    )


# --------------------------------------------------------------------------
# audio resample (2x decimation through the real WAV codec, both ways)
# --------------------------------------------------------------------------


class WavResample:
    """REAL resample actor: decode the WAV blob, 2x-decimate by exact
    pairwise floor-mean (``floor((s0 + s1) / 2)`` — floor, NOT
    truncate: the SQL mirror uses ``floor((s0+s1)/2.0)`` because
    DuckDB ``//`` truncates toward zero and samples go negative, the
    events_retention lesson), RE-ENCODE the half-rate stream through
    the same first-party codec, decode THAT back, and emit integer
    stats of the round-tripped result."""

    def __init__(self):
        from ..functions import wav

        self.decode, self.encode = wav.decode_wav, wav.encode_wav

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t["wav"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ns, sums, peaks = [], [], []
        for buf in col:
            arr, rate = self.decode(buf.as_py())
            a = arr[:, 0].astype(np.int64)
            half = len(a) // 2
            pair = a[: half * 2].reshape(half, 2)
            r = np.floor((pair[:, 0] + pair[:, 1]) / 2.0).astype(np.int64)
            back, _ = self.decode(self.encode(r.astype(np.int16), rate // 2))
            b = back[:, 0].astype(np.int64)
            ns.append(len(b))
            sums.append(int(b.sum()))
            peaks.append(int(np.abs(b).max()) if len(b) else 0)
        return pa.table(
            {
                "page_id": t["page_id"],
                "n_out": pa.array(ns, pa.int64()),
                "sum_r": pa.array(sums, pa.int64()),
                "peak_r": pa.array(peaks, pa.int64()),
            }
        )


def audio_resample(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """2x audio decimation as a real codec round trip: WAV synth ->
    decode -> exact pairwise floor-mean -> RE-ENCODE at half rate ->
    decode back -> integer stats.  The resample stage every audio
    training pipeline runs before feature extraction, with the
    int16 clamp semantics pinned by the closed-form SQL mirror
    (samples stay within int16 by construction, so re-encode is
    lossless and the oracle needs no clamp branch).

    Actor-pool stage: codec state in ``__init__``; per-row Python is
    the file loop (each row IS a whole audio file), the sample math
    inside stays numpy."""
    ds = pages_dataset(sf_dir, rep=cfg.pages_rep, columns=["page_id"])
    ds = ds.map_batches(WavSynth(), batch_format="pyarrow", batch_size=MEDIA_BATCH)
    return ds.map_batches(
        WavResample,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


def audio_resample_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..sources.pages import pages_cte

    return (
        f"with pages as ({pages_cte(cfg.pages_rep)}), "
        f"dims as (select page_id, ({WAV_BASE} + page_id % 64) // 2 as half from pages), "
        "smp as (select page_id, half, "
        f"cast(floor((((page_id * 5 + (2 * t.v) * 11) % {WAV_MOD}) - {WAV_MOD // 2} "
        f"+ ((page_id * 5 + (2 * t.v + 1) * 11) % {WAV_MOD}) - {WAV_MOD // 2}) / 2.0) as bigint) as r "
        "from dims, unnest(range(half)) t(v)) "
        "select page_id, cast(half as bigint) as n_out, "
        "cast(sum(r) as bigint) as sum_r, cast(max(abs(r)) as bigint) as peak_r "
        "from smp group by page_id, half"
    )


# --------------------------------------------------------------------------
# video temporal difference / scene-cut flags (all frames decoded)
# --------------------------------------------------------------------------

CUT_NUM = 8000  # is_cut iff diff_sum * 251 > CUT_NUM * pixels (integer)


class VideoDiff:
    """REAL temporal-difference actor: parse the container, decode
    EVERY frame with the first-party PNG codec, emit per consecutive
    frame pair the exact absolute pixel-difference mass and the
    integer cross-multiplied cut flag (no float threshold)."""

    def __init__(self):
        from ..functions import png

        self.decode = png.decode_png

    def __call__(self, t: pa.Table) -> pa.Table:
        import struct

        pid = t["page_id"]
        col = t["video"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        pids, fidx, diffs, cuts = [], [], [], []
        for p, buf in zip(pid.to_numpy(zero_copy_only=False), col):
            raw = buf.as_py()
            if raw[:4] != VID_MAGIC:
                raise ValueError("bad frame container")
            (n,) = struct.unpack("<I", raw[4:8])
            offs = struct.unpack(f"<{n}I", raw[8 : 8 + 4 * n])
            ends = list(offs[1:]) + [len(raw)]
            frames = [
                self.decode(raw[offs[f] : ends[f]]).astype(np.int64)
                for f in range(n)
            ]
            for f in range(n - 1):
                d = int(np.abs(frames[f + 1] - frames[f]).sum())
                px = frames[f].size
                pids.append(int(p))
                fidx.append(f)
                diffs.append(d)
                cuts.append(int(d * 251 > CUT_NUM * px))
        return pa.table(
            {
                "page_id": pa.array(pids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int64()),
                "diff_sum": pa.array(diffs, pa.int64()),
                "is_cut": pa.array(cuts, pa.int64()),
            }
        )


def video_scene_cuts(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Scene-cut detection over the binary video column: decode all
    frames (real codec), per consecutive pair emit the exact absolute
    temporal-difference mass and an integer-predicate cut flag — the
    shot-boundary pass a video curation pipeline runs before frame
    sampling.  Actor-pool stage; per-row Python is the file/frame
    loop (each row is a whole container), pixel math stays numpy."""
    ds = pages_dataset(sf_dir, rep=cfg.pages_rep, columns=["page_id"])
    ds = ds.map_batches(VideoSynth(), batch_format="pyarrow", batch_size=MEDIA_BATCH)
    return ds.map_batches(
        VideoDiff,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


def video_scene_cuts_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..sources.pages import pages_cte

    law = "((page_id * 3 + {f} * 17 + i.v * 7 + j.v * 13) % " + str(PNG_MOD) + ")"
    return (
        f"with pages as ({pages_cte(cfg.pages_rep)}), "
        "dims as (select page_id, 16 + page_id % 8 as w, 12 + page_id % 5 as h, "
        "2 + page_id % 3 as nf from pages), "
        "fr as (select page_id, w, h, f.v as frame_idx from dims, "
        "unnest(range(nf - 1)) f(v)), "
        "px as (select page_id, frame_idx, w, h, "
        f"abs({law.format(f='(frame_idx + 1)')} - {law.format(f='frame_idx')}) as d "
        "from fr, unnest(range(h)) i(v), unnest(range(w)) j(v)) "
        "select page_id, frame_idx, cast(sum(d) as bigint) as diff_sum, "
        f"cast(sum(d) * 251 > {CUT_NUM} * (w * h) as bigint) as is_cut "
        "from px group by page_id, frame_idx, w, h"
    )


# --------------------------------------------------------------------------
# raster histogram equalization (two windowed passes over the real file)
# --------------------------------------------------------------------------


def raster_equalize(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CFG, res: int = HEATMAP_RES
) -> ray.data.Dataset:
    """Global histogram equalization over the heatmap GeoTIFF — the
    classic raster contrast transform, run the way a raster engine
    must at scale: pass 1 streams tile WINDOWS of the real file
    (strip-range reads) into a 256-bin histogram fold; the driver
    derives the integer remap table ``eq(v) = (cdf(v) - cdf_min) *
    255 // (N - cdf_min)`` (all non-negative integers, so numpy
    floor == SQL truncate); pass 2 re-streams the windows and applies
    the broadcast LUT, emitting per-tile equalized stats.  The DENSE
    raster never sits in one process; only 256-bin partials and the
    LUT move.

    Output (tile_id, col_off, row_off, eq_sum, eq_max) per window."""
    import ray

    from ..config import TileGridSpec
    from ..sources.geotiff import read_raster_windows

    # ensure the heatmap exists (idempotent atomic write inside)
    heatmap_geotiff(sf_dir, cfg, res)
    path = f"{HEATMAP_DIR}/heatmap_r{res}_{cfg.pages_rep}.tif"
    grid = TileGridSpec(tile_width=HEATMAP_TILE, tile_height=HEATMAP_TILE)

    win = read_raster_windows(path, grid)

    def hist_partial(t: pa.Table) -> pa.Table:
        col = t["pixels"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = np.zeros(256, np.int64)
        for buf in col:
            px = np.frombuffer(buf.as_py(), np.uint8)
            h += np.bincount(px, minlength=256)
        return pa.table(
            {"v": pa.array(np.arange(256, dtype=np.int64)), "n": pa.array(h)}
        )

    hist = (
        win.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("v")
    )
    n_arr = np.zeros(256, np.int64)
    n_arr[hist["v"].to_numpy(np.int64)] = hist["n"].to_numpy(np.int64)
    cdf = np.cumsum(n_arr)
    nz = np.nonzero(n_arr)[0]
    cdf_min = int(cdf[nz[0]]) if len(nz) else 0
    total = int(cdf[-1])
    denom = max(total - cdf_min, 1)
    lut = ((cdf - cdf_min).clip(min=0) * 255 // denom).astype(np.int64)
    lut_ref = ray.put(lut)

    class Remap:
        def __init__(self):
            self.lut = ray.get(lut_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t["pixels"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            sums, maxs = [], []
            for buf in col:
                px = self.lut[np.frombuffer(buf.as_py(), np.uint8)]
                sums.append(int(px.sum()))
                maxs.append(int(px.max()))
            return pa.table(
                {
                    "tile_id": t["tile_id"],
                    "col_off": t["col_off"],
                    "row_off": t["row_off"],
                    "eq_sum": pa.array(sums, pa.int64()),
                    "eq_max": pa.array(maxs, pa.int64()),
                }
            )

    return read_raster_windows(path, grid).map_batches(
        Remap, batch_format="pyarrow", concurrency=2
    )


def raster_equalize_sql(cfg: EngineConfig = DEFAULT_CFG, res: int = HEATMAP_RES) -> str:
    from .sql_oracle import _pages_geo
    from ..geo import cells

    n = 1 << res
    t = HEATMAP_TILE
    total_px = n * (n // 2)
    cell = cells.sql_expr("lon", "lat", res)
    return (
        _pages_geo(cfg)
        + f""",
cellt as (select {cell} as cell from geo),
cnt as (select cell, count(*) as cn from cellt group by cell),
px as (select cell % {n} as ix, ({n // 2 - 1}) - (cell // {n}) as iy,
              least(cn, 255) as v from cnt),
hist0 as (select v, count(*) as hn from px group by v),
hist as (select v, hn from hist0
         union all
         select 0 as v, {total_px} - (select sum(hn) from hist0) as hn),
h as (select v, sum(hn) as hn from hist group by v),
c as (select v, hn, sum(hn) over (order by v) as cdf from h),
params as (select min(cdf) filter (where hn > 0) as cdf_min,
                  {total_px} as total from c),
lut as (select v, greatest(cdf - cdf_min, 0) * 255
                  // greatest(total - cdf_min, 1) as eq
        from c cross join params),
tiles as (select cx.v as col_off, ry.v as row_off from
  (select unnest(range(0, {n}, {t})) as v) cx,
  (select unnest(range(0, {n // 2}, {t})) as v) ry),
occ as (select (ix // {t}) * {t} as col_off, (iy // {t}) * {t} as row_off,
               sum(l.eq) as occ_sum, count(*) as occ_n, max(l.eq) as occ_max
        from px join lut l using (v) group by 1, 2),
z as (select eq as zero_eq from lut where v = 0)
select ('tile_' || cast(tiles.col_off as varchar) || '-' ||
        cast(tiles.row_off as varchar)) as tile_id,
       cast(tiles.col_off as bigint) as col_off,
       cast(tiles.row_off as bigint) as row_off,
       cast(coalesce(occ_sum, 0)
            + ({t * t} - coalesce(occ_n, 0)) * z.zero_eq as bigint) as eq_sum,
       cast(greatest(coalesce(occ_max, 0),
                     case when coalesce(occ_n, 0) < {t * t} then z.zero_eq
                          else 0 end) as bigint) as eq_max
from tiles left join occ
  on occ.col_off = tiles.col_off and occ.row_off = tiles.row_off
cross join z
"""
    )


# --------------------------------------------------------------------------
# raster overview build (2x box downsample through the real GeoTIFF)
# --------------------------------------------------------------------------


def raster_downsample(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CFG, res: int = HEATMAP_RES
) -> ray.data.Dataset:
    """Overview (pyramid-level) build over the heatmap GeoTIFF — the
    ``gdaladdo`` analog every raster store runs after ingest: stream
    tile WINDOWS of the full-res file (strip-range reads, never the
    whole raster in one task), 2x2 box-downsample each window
    independently (``v' = (a+b+c+d) // 4``, non-negative so numpy
    floor == SQL truncate), assemble the HALF-RES overview (driver
    collection bounded by the overview grid — corpus-independent,
    the heatmap_geotiff justification), write it as a REAL GeoTIFF
    (doubled cell size, atomic tmp+rename), and read THAT back
    through the windowed reader as per-tile integer stats.

    Window edges can't straddle a 2x2 block: the full-res grid is an
    exact multiple of HEATMAP_TILE and the tile size is even.

    Output (tile_id, col_off, row_off, width, height, px_sum, px_max)
    per overview window."""
    import os

    from ..config import RasterSpec, TileGridSpec
    from ..sources.geotiff import read_raster_windows, write_geotiff

    heatmap_geotiff(sf_dir, cfg, res)
    n = 1 << res
    base = f"{HEATMAP_DIR}/heatmap_r{res}_{cfg.pages_rep}.tif"
    grid = TileGridSpec(tile_width=HEATMAP_TILE, tile_height=HEATMAP_TILE)

    def down(t: pa.Table) -> pa.Table:
        col = t["pixels"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        w = t["width"].to_numpy(zero_copy_only=False)
        h = t["height"].to_numpy(zero_copy_only=False)
        blocks = []
        for i, buf in enumerate(col):
            px = np.frombuffer(buf.as_py(), np.uint8).reshape(h[i], w[i])
            d = (
                px.astype(np.int64)
                .reshape(h[i] // 2, 2, w[i] // 2, 2)
                .sum(axis=(1, 3))
                // 4
            ).astype(np.uint8)
            blocks.append(d.tobytes())
        return pa.table(
            {
                "col_off2": pc.divide(t["col_off"], 2),
                "row_off2": pc.divide(t["row_off"], 2),
                "w2": pa.array((w // 2).astype(np.int64)),
                "h2": pa.array((h // 2).astype(np.int64)),
                "block": pa.array(blocks, pa.binary()),
            }
        )

    blocks = read_raster_windows(base, grid).map_batches(
        down, batch_format="pyarrow"
    ).to_pandas()  # bounded by the OVERVIEW grid, not the corpus
    img2 = np.zeros((n // 4, n // 2), np.uint8)
    for _, r in blocks.iterrows():
        b = np.frombuffer(r["block"], np.uint8).reshape(r["h2"], r["w2"])
        img2[r["row_off2"] : r["row_off2"] + r["h2"], r["col_off2"] : r["col_off2"] + r["w2"]] = b
    spec2 = RasterSpec(
        x0=-180.0, y_max=90.0, cell=720.0 / n, ncols=n // 2, nrows=n // 4
    )
    os.makedirs(HEATMAP_DIR, exist_ok=True)
    path2 = f"{HEATMAP_DIR}/heatmap_r{res}_{cfg.pages_rep}_ov2.tif"
    tmp = f"{path2}.{os.getpid()}"
    write_geotiff(tmp, img2, spec2, rows_per_strip=16)
    os.replace(tmp, path2)

    grid2 = TileGridSpec(tile_width=HEATMAP_TILE // 2, tile_height=HEATMAP_TILE // 2)

    def stats(t: pa.Table) -> pa.Table:
        col = t["pixels"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        sums, maxs = [], []
        for buf in col:
            px = np.frombuffer(buf.as_py(), np.uint8)
            sums.append(int(px.sum()))
            maxs.append(int(px.max()))
        return pa.table(
            {
                "tile_id": t["tile_id"],
                "col_off": t["col_off"],
                "row_off": t["row_off"],
                "width": t["width"],
                "height": t["height"],
                "px_sum": pa.array(sums, pa.int64()),
                "px_max": pa.array(maxs, pa.int64()),
            }
        )

    return read_raster_windows(path2, grid2).map_batches(
        stats, batch_format="pyarrow"
    )


def raster_downsample_sql(cfg: EngineConfig = DEFAULT_CFG, res: int = HEATMAP_RES) -> str:
    from .sql_oracle import _pages_geo
    from ..geo import cells

    n = 1 << res
    t = HEATMAP_TILE // 2
    cell = cells.sql_expr("lon", "lat", res)
    return (
        _pages_geo(cfg)
        + f""",
cellt as (select {cell} as cell from geo),
cnt as (select cell, count(*) as cn from cellt group by cell),
px as (select cell % {n} as ix, ({n // 2 - 1}) - (cell // {n}) as iy,
              least(cn, 255) as v from cnt),
px2 as (select ix // 2 as jx, iy // 2 as jy, sum(v) // 4 as v
        from px group by 1, 2),
tiles as (select cx.v as col_off, ry.v as row_off from
  (select unnest(range(0, {n // 2}, {t})) as v) cx,
  (select unnest(range(0, {n // 4}, {t})) as v) ry),
occ as (select (jx // {t}) * {t} as col_off, (jy // {t}) * {t} as row_off,
               sum(v) as occ_sum, max(v) as occ_max
        from px2 group by 1, 2)
select ('tile_' || cast(tiles.col_off as varchar) || '-' ||
        cast(tiles.row_off as varchar)) as tile_id,
       cast(tiles.col_off as bigint) as col_off,
       cast(tiles.row_off as bigint) as row_off,
       cast({t} as bigint) as width, cast({t} as bigint) as height,
       cast(coalesce(occ_sum, 0) as bigint) as px_sum,
       cast(coalesce(occ_max, 0) as bigint) as px_max
from tiles left join occ
  on occ.col_off = tiles.col_off and occ.row_off = tiles.row_off
"""
    )


# --------------------------------------------------------------------------
# perceptual image hashing (dHash) + near-dup pairs
# --------------------------------------------------------------------------

PHASH_MOD = 31  # 1 page in 31 carries an image through the phash path
PHASH_BANDS = 4
PHASH_BAND_BITS = 16
PHASH_HAM_D = 3  # pigeonhole: d+1 bands of the 64-bit hash


class PngDHash:
    """Decode each PNG with the first-party codec and compute its
    64-bit dHash (difference hash): box-bucket the grayscale image
    onto a 9 x 8 mean grid, bit (r, c) = mean(r, c) > mean(r, c+1).
    Bucket means are compared by integer cross-multiplication
    (``s_l * n_r > s_r * n_l``) so the hash is integer-exact and the
    SQL oracle reproduces it bit for bit.  Emitted as two int64
    halves (bits 0-31 / 32-63) to stay sign-safe."""

    def __init__(self):
        from ..functions import png

        self.decode = png.decode_png

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t["png"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        w32 = (np.uint64(1) << np.arange(32, dtype=np.uint64)).astype(np.uint64)
        ws, hs, los, his = [], [], [], []
        for buf in col:
            img = self.decode(buf.as_py()).astype(np.int64)
            h, w = img.shape
            r = (np.arange(h) * 8) // h
            c = (np.arange(w) * 9) // w
            rs = np.zeros((8, w), dtype=np.int64)
            np.add.at(rs, r, img)
            s = np.zeros((9, 8), dtype=np.int64)
            np.add.at(s, c, rs.T)
            s = s.T  # (8, 9) bucket pixel sums
            n = np.outer(np.bincount(r, minlength=8), np.bincount(c, minlength=9))
            bits = (s[:, :8] * n[:, 1:] > s[:, 1:] * n[:, :8]).flatten()
            los.append(int((bits[:32] * w32).sum()))
            his.append(int((bits[32:] * w32).sum()))
            hs.append(h)
            ws.append(w)
        return pa.table(
            {
                "page_id": t["page_id"],
                "img_w": pa.array(ws, pa.int64()),
                "img_h": pa.array(hs, pa.int64()),
                "h_lo": pa.array(los, pa.int64()),
                "h_hi": pa.array(his, pa.int64()),
            }
        )


def _phash_ds(sf_dir: str, cfg: EngineConfig) -> ray.data.Dataset:
    ds = pages_dataset(sf_dir, rep=cfg.pages_rep, columns=["page_id"])

    def sample(t: pa.Table) -> pa.Table:
        pid = t["page_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(pid % PHASH_MOD == 0))

    ds = ds.map_batches(sample, batch_format="pyarrow")
    ds = ds.map_batches(PngImageSynth(), batch_format="pyarrow", batch_size=MEDIA_BATCH)
    return ds.map_batches(
        PngDHash,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


def image_phash(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Per-image perceptual hash over the sampled media column: real
    PNG synth -> real decode -> integer-exact dHash.  Row-local
    (zero shuffle); the codec actor pool is the stateful stage."""
    return _phash_ds(sf_dir, cfg)


def _phash_px_cte(cfg: EngineConfig) -> str:
    from ..sources.pages import pages_cte

    return f"""
pages as ({pages_cte(cfg.pages_rep)}),
dims as (select page_id, 16 + page_id % 8 as w, 12 + page_id % 5 as h
         from pages where page_id % {PHASH_MOD} = 0),
px as (select page_id, w, h, i.v as i, j.v as j,
              ((page_id * 3 + i.v * 7 + j.v * 13) % {PNG_MOD}) as v
       from dims, unnest(range(h)) i(v), unnest(range(w)) j(v)),
cells as (select page_id, w, h, (i * 8) // h as r, (j * 9) // w as c,
                 count(*) as n, sum(v) as s
          from px group by 1, 2, 3, 4, 5),
bits as (select a.page_id, a.w, a.h, a.r * 8 + a.c as idx,
                case when a.s * b.n > b.s * a.n then 1 else 0 end as bit
         from cells a join cells b
           on b.page_id = a.page_id and b.r = a.r and b.c = a.c + 1
         where a.c < 8),
phash as (
  select page_id, cast(w as bigint) as img_w, cast(h as bigint) as img_h,
         cast(sum(case when idx < 32 then bit * (1::bigint << idx)
                       else 0 end) as bigint) as h_lo,
         cast(sum(case when idx >= 32 then bit * (1::bigint << (idx - 32))
                       else 0 end) as bigint) as h_hi
  from bits group by page_id, w, h)
"""


def image_phash_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    return f"with {_phash_px_cte(cfg)} select * from phash"


def phash_pairs(
    sf_dir: str, cfg: EngineConfig = DEFAULT_CFG, d: int = PHASH_HAM_D
) -> ray.data.Dataset:
    """ALL sampled-image pairs with dHash Hamming distance <= ``d`` —
    exactly, via the ``simhash_pairs`` law: d+1 = 4 bands of 16 bits,
    any pair within distance d agrees on a full band (pigeonhole), a
    band-bucket groupby yields the guaranteed candidate superset and a
    vectorized popcount verifies.  First-equal-band dedup keeps each
    pair exactly once without a distinct pass.  Near-identical images
    (brightness-shifted copies of the same layout) land in the same
    bucket; a pathological identical-image clique would be df-capped
    like ``jaccard_pairs``.  Output (a, b, hamming), a < b."""
    assert d == PHASH_HAM_D, "band split is compile-time for the SQL mirror"
    from .text import _popcount64

    bb = PHASH_BAND_BITS
    mask = np.uint64((1 << bb) - 1)
    ds = _phash_ds(sf_dir, cfg)

    def explode(t: pa.Table) -> pa.Table:
        ids = t["page_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        fp = t["h_lo"].to_numpy(zero_copy_only=False).astype(np.uint64) | (
            t["h_hi"].to_numpy(zero_copy_only=False).astype(np.uint64) << np.uint64(32)
        )
        n = len(ids)
        band = np.tile(np.arange(PHASH_BANDS, dtype=np.int64), n)
        rid = np.repeat(ids, PHASH_BANDS)
        rfp = np.repeat(fp, PHASH_BANDS)
        key = ((rfp >> (band.astype(np.uint64) * np.uint64(bb))) & mask).astype(
            np.int64
        )
        return pa.table(
            {
                "band": pa.array(band),
                "key": pa.array(key),
                "page_id": pa.array(rid),
                "phash": pa.array(rfp.view(np.int64)),
            }
        )

    def pairs(df):
        import pandas as pd

        if len(df) < 2:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=np.int64),
                    "b": pd.Series([], dtype=np.int64),
                    "hamming": pd.Series([], dtype=np.int64),
                }
            )
        b0 = int(df["band"].iloc[0])
        ids = df["page_id"].to_numpy(np.int64)
        fp = df["phash"].to_numpy(np.int64).view(np.uint64)
        iu, ju = np.triu_indices(len(ids), k=1)
        x = fp[iu] ^ fp[ju]
        ham = _popcount64(x)
        keep = ham <= d
        for earlier in range(b0):
            seg = (x >> np.uint64(earlier * bb)) & mask
            keep &= seg != 0
        a = np.minimum(ids[iu], ids[ju])[keep]
        b = np.maximum(ids[iu], ids[ju])[keep]
        out = pd.DataFrame({"a": a, "b": b, "hamming": ham[keep].astype(np.int64)})
        return out[out["a"] != out["b"]]

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(pairs, batch_format="pandas")
    )


def phash_pairs_sql(cfg: EngineConfig = DEFAULT_CFG, d: int = PHASH_HAM_D) -> str:
    return f"""
with {_phash_px_cte(cfg)}
select x.page_id as a, y.page_id as b,
       cast(bit_count(xor(x.h_lo, y.h_lo)) + bit_count(xor(x.h_hi, y.h_hi))
            as bigint) as hamming
from phash x join phash y on x.page_id < y.page_id
where bit_count(xor(x.h_lo, y.h_lo)) + bit_count(xor(x.h_hi, y.h_hi)) <= {d}
"""


class WavZcr:
    """Decode + signal features per blob: zero-crossing count (strict
    sign flips between adjacent samples) and integer energy — the
    audio quality/voicedness signals, integer-exact."""

    def __init__(self):
        from ..functions import wav

        self.decode = wav.decode_wav

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t["wav"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        zcs, ens = [], []
        for buf in col:
            arr, _rate = self.decode(buf.as_py())
            a = arr[:, 0].astype(np.int64)
            zcs.append(int(np.count_nonzero(a[:-1] * a[1:] < 0)))
            ens.append(int((a * a).sum()))
        return pa.table(
            {
                "page_id": t["page_id"],
                "zero_crossings": pa.array(zcs, pa.int64()),
                "energy": pa.array(ens, pa.int64()),
            }
        )


def audio_zcr(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Zero-crossing rate + energy over the real decoded waveforms
    (same synth -> first-party RIFF decode path as ``audio_decode``;
    row-local actor stage, zero shuffle)."""
    ds = pages_dataset(sf_dir, rep=cfg.pages_rep, columns=["page_id"])
    ds = ds.map_batches(WavSynth(), batch_format="pyarrow", batch_size=MEDIA_BATCH)
    return ds.map_batches(
        WavZcr,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


def audio_zcr_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    from ..sources.pages import pages_cte

    return (
        f"with pages as ({pages_cte(cfg.pages_rep)}), "
        f"dims as (select page_id, {WAV_BASE} + page_id % 64 as n from pages), "
        f"smp as (select page_id, t.v as v, "
        f"((page_id * 5 + t.v * 11) % {WAV_MOD}) - {WAV_MOD // 2} as s "
        "from dims, unnest(range(n)) t(v)), "
        "lagd as (select page_id, s, "
        "lag(s) over (partition by page_id order by v) as prev from smp) "
        "select page_id, "
        "cast(count(*) filter (where prev is not null and s * prev < 0) "
        "as bigint) as zero_crossings, "
        "cast(sum(s * s) as bigint) as energy "
        "from lagd group by page_id"
    )


# --------------------------------------------------------------------------
# Sobel edge statistics over decoded pixels (round-4h)
# --------------------------------------------------------------------------

EDGE_T = 400  # |gx|+|gy| threshold for the strong-edge count


class PngSobel:
    """REAL-decode actor -> integer-exact Sobel gradient statistics.

    The image-kernel member of the multimodal family (the classic
    first conv layer of any vision featurizer; reference analog: the
    raster band math feeding ``scripts/jpeg2tiff.py``).  Per image:
    decode PNG (``functions/png.py``), apply the 3x3 Sobel pair on
    the interior via shifted-slice adds (one vectorized expression
    per kernel tap, no per-pixel loop), emit
    ``edge_sum = sum(|gx|+|gy|)``, ``edge_max`` and the strong-edge
    count at the compile-time threshold — all int64, exact, so the
    DuckDB pixel-mirror oracle matches bit-for-bit."""

    def __init__(self):
        from ..functions import png

        self.decode = png.decode_png

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t["png"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ws, hs, sums, maxs, cnts = [], [], [], [], []
        for buf in col:
            a = self.decode(buf.as_py()).astype(np.int64)
            h, w = a.shape
            gx = (
                a[:-2, 2:] + 2 * a[1:-1, 2:] + a[2:, 2:]
                - a[:-2, :-2] - 2 * a[1:-1, :-2] - a[2:, :-2]
            )
            gy = (
                a[2:, :-2] + 2 * a[2:, 1:-1] + a[2:, 2:]
                - a[:-2, :-2] - 2 * a[:-2, 1:-1] - a[:-2, 2:]
            )
            mag = np.abs(gx) + np.abs(gy)
            hs.append(h)
            ws.append(w)
            sums.append(int(mag.sum()))
            maxs.append(int(mag.max()) if mag.size else 0)
            cnts.append(int((mag >= EDGE_T).sum()))
        return pa.table(
            {
                "page_id": t["page_id"],
                "img_w": pa.array(ws, pa.int64()),
                "img_h": pa.array(hs, pa.int64()),
                "edge_sum": pa.array(sums, pa.int64()),
                "edge_max": pa.array(maxs, pa.int64()),
                "edge_count": pa.array(cnts, pa.int64()),
            }
        )


def image_edges(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Per-image Sobel edge statistics over the sampled media column:
    real PNG synth -> real decode -> integer-exact gradient kernel.
    Row-local (zero shuffle); the codec actor pool is the stateful
    stage, same shape as ``image_phash``."""
    ds = pages_dataset(sf_dir, rep=cfg.pages_rep, columns=["page_id"])

    def sample(t: pa.Table) -> pa.Table:
        pid = t["page_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(pid % PHASH_MOD == 0))

    ds = ds.map_batches(sample, batch_format="pyarrow")
    ds = ds.map_batches(PngImageSynth(), batch_format="pyarrow", batch_size=MEDIA_BATCH)
    return ds.map_batches(
        PngSobel,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )


def image_edges_sql(cfg: EngineConfig = DEFAULT_CFG) -> str:
    """Pixel-mirror oracle: the 3x3 Sobel taps as a self-join with
    weights ``(dj)*(2-|di|)`` / ``(di)*(2-|dj|)`` over the same
    deterministic pixel formula the engine encodes into real PNGs."""
    return f"""
with {_phash_px_cte(cfg)},
g as (
  select a.page_id, a.w, a.h, a.i, a.j,
         sum(b.v * (b.j - a.j) * (2 - abs(b.i - a.i))) as gx,
         sum(b.v * (b.i - a.i) * (2 - abs(b.j - a.j))) as gy
  from px a join px b
    on b.page_id = a.page_id
   and abs(b.i - a.i) <= 1 and abs(b.j - a.j) <= 1
  where a.i between 1 and a.h - 2 and a.j between 1 and a.w - 2
  group by 1, 2, 3, 4, 5
)
select page_id,
       cast(w as bigint) as img_w,
       cast(h as bigint) as img_h,
       cast(sum(abs(gx) + abs(gy)) as bigint) as edge_sum,
       cast(max(abs(gx) + abs(gy)) as bigint) as edge_max,
       cast(count(*) filter (where abs(gx) + abs(gy) >= {EDGE_T})
            as bigint) as edge_count
from g group by page_id, w, h
"""


# --------------------------------------------------------------------------
# STFT power spectrogram band energies (round-4h)
# --------------------------------------------------------------------------

SPEC_NFFT = 64
SPEC_HOP = 32
SPEC_BANDS = 4


class WavSpectrogram:
    """REAL-decode actor -> STFT band energies per audio blob.

    The DSP member of the multimodal family (the featurizer front-end
    of every audio model: frame -> Hann window -> rfft -> power).
    All frames of a blob transform in ONE batched ``np.fft.rfft``
    call (axis-1 over the (frames, 64) matrix — vectorized, no
    per-frame loop); the Hann window is built once per actor in
    ``__init__``.  Output per page: frame count, the four 8-bin band
    powers (floored to int64 so results are deterministic and
    hashable), and the dominant non-DC bin.  FFT results are
    irrational in the inputs, so this is a rows-only driver entry —
    exactness is pinned by the numpy-recompute pytest plus a Parseval
    invariant (``tests/test_round4h_ops.py``)."""

    def __init__(self):
        from ..functions import wav

        self.decode = wav.decode_wav
        k = np.arange(SPEC_NFFT)
        self.win = 0.5 - 0.5 * np.cos(2.0 * np.pi * k / SPEC_NFFT)

    def __call__(self, t: pa.Table) -> pa.Table:
        from numpy.lib.stride_tricks import sliding_window_view

        col = t["wav"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        nf, bands, dom = [], [], []
        for buf in col:
            arr, _rate = self.decode(buf.as_py())
            a = arr[:, 0].astype(np.float64)
            frames = sliding_window_view(a, SPEC_NFFT)[::SPEC_HOP]
            x = np.fft.rfft(frames * self.win[None, :], axis=1)
            p = (x.real**2 + x.imag**2).sum(axis=0)  # per-bin total power
            b = p[1 : 1 + 8 * SPEC_BANDS].reshape(SPEC_BANDS, 8).sum(axis=1)
            nf.append(frames.shape[0])
            bands.append(np.floor(b).astype(np.int64))
            dom.append(int(np.argmax(p[1:])) + 1)
        bm = np.stack(bands) if bands else np.empty((0, SPEC_BANDS), np.int64)
        cols = {
            "page_id": t["page_id"],
            "n_frames": pa.array(nf, pa.int64()),
        }
        for i in range(SPEC_BANDS):
            cols[f"band{i}"] = pa.array(bm[:, i], pa.int64())
        cols["dom_bin"] = pa.array(dom, pa.int64())
        return pa.table(cols)


def audio_spectrogram(sf_dir: str, cfg: EngineConfig = DEFAULT_CFG) -> ray.data.Dataset:
    """Per-page STFT power-spectrogram band energies over the audio
    column: real WAV synth -> real RIFF decode -> batched rfft.
    Row-local (zero shuffle); the DSP actor pool is the stateful
    stage, same shape as ``audio_zcr``."""
    ds = pages_dataset(sf_dir, rep=cfg.pages_rep, columns=["page_id"])
    ds = ds.map_batches(WavSynth(), batch_format="pyarrow", batch_size=MEDIA_BATCH)
    return ds.map_batches(
        WavSpectrogram,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH,
        concurrency=pool_size(),
    )
