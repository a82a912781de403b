"""Webtext extraction: general HTML parsing on crafted pages (not
just the synthesizer's wrapper) + PII redaction semantics."""

import pyarrow as pa

from aerial_conversion_ray.pipelines import extract


def _run_html(htmls: list[str]) -> pa.Table:
    t = pa.table(
        {
            "page_id": pa.array(range(len(htmls)), pa.int64()),
            "url": pa.array([f"u{i}" for i in range(len(htmls))]),
            "html": pa.array([h.encode() for h in htmls], pa.binary()),
        }
    )
    return extract.extract_html_batch(t)


def test_html_extract_general_pages():
    out = _run_html(
        [
            # attributes on tags, nested markup, script+style dropped
            '<html><head><title lang="en">T&amp;1</title>'
            "<style>p{color:red}</style></head>"
            '<body class="x"><h1>Hello</h1> <p>a &lt;b&gt; &quot;c&quot;'
            "</p><script>var x = '<p>not text</p>';</script>!</body></html>",
            # no <body> at all: falls back to whole page minus <head>
            "<html><head><title>only head</title></head><p>loose text</p></html>",
            # entities decode exactly once (&amp;lt; -> &lt;)
            "<body>&amp;lt; stays</body>",
        ]
    )
    titles = out["title"].to_pylist()
    texts = out["extracted"].to_pylist()
    assert titles == ["T&1", "only head", ""]
    assert texts[0] == "Hello a <b> \"c\"!"
    assert texts[1] == "loose text"
    assert texts[2] == "&lt; stays"


def test_html_extract_byte_identity_on_corpus(sf_dir):
    """The north-rule invariant end-to-end: extraction of the html
    column is byte-identical to the source text per url."""
    import pyarrow.parquet as pq

    got = extract.html_extract(sf_dir).to_pandas()
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    by_doc = docs.set_index("doc_id")["text"]
    # rep=1 -> page_id == doc_id
    assert (got["extracted"].to_numpy() == by_doc.loc[got["page_id"]].to_numpy()).all()
    assert (got["title"] == got["page_id"].astype(str)).all()


def test_pii_redact_crafted():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                [
                    "mail a.b+c@x.co or 1.2.3.4 end",
                    "no pii here",
                ]
            ),
        }
    )
    out = extract.pii_redact_batch(t).to_pandas().set_index("doc_id")
    # row 1: crafted email+ip, plus the deterministic contact block
    # (doc_id=1: all three gates on -> +1 email, +1 phone, +1 ip)
    assert out.loc[1, "n_email"] == 2
    assert out.loc[1, "n_phone"] == 1
    assert out.loc[1, "n_ip"] == 2
    red = out.loc[1, "redacted"]
    assert "a.b+c@x.co" not in red and "1.2.3.4" not in red
    assert red.startswith("mail <EMAIL> or <IP> end")
    assert "<PHONE>" in red and "<EMAIL>" in red
    # row 2 (doc_id=2): only the gated contact block contributes
    assert out.loc[2, "n_email"] == 1  # 2 % 3 != 0
    assert out.loc[2, "n_phone"] == 1  # 2 % 4 != 0
    assert out.loc[2, "n_ip"] == 1  # 2 % 5 != 0
    assert out.loc[2, "redacted"].startswith("no pii here reach ")


def test_canonicalize_urls_general():
    """The canonicalizer is general (not shaped to the synthetic
    variants): fragment, default-port, tracking-param, host-case and
    trailing-slash noise all collapse; real query params survive."""
    raw = pa.array(
        [
            "HTTPS://News.Example/a/B?q=1#frag",
            "https://news.example:443/a/B?q=1",
            "https://news.example/a/B?utm_source=x&q=1&utm_campaign=y",
            "https://news.example/a/B/?q=1",
            "https://news.example/a/B?q=1&ref=abc",
            "http://other.example/path?page=2&utm_medium=mail",
        ]
    )
    got = extract.canonicalize_urls(raw).to_pylist()
    assert got[:5] == ["https://news.example/a/B?q=1"] * 5
    assert got[5] == "http://other.example/path?page=2"
    # literal '&' (or '&utm_x=') in the PATH of a query-less URL must
    # survive untouched — the tracking strip is query-scoped
    hard = extract.canonicalize_urls(
        pa.array(
            [
                "https://h.example/a&b",
                "https://h.example/p&utm_source=path",
                "https://h.example/x?utm_a=1&utm_b=2",
            ]
        )
    ).to_pylist()
    assert hard == [
        "https://h.example/a&b",
        "https://h.example/p&utm_source=path",
        "https://h.example/x",
    ]


def test_url_dedup_collapses_variants(sf_dir):
    """Every canonical url groups exactly the pages that differ only
    in cosmetics; representative is min page_id."""
    import duckdb

    out = extract.url_dedup(sf_dir).to_pandas()
    con = duckdb.connect()
    _register_views(con, sf_dir)
    want = con.execute(extract.url_dedup_sql()).fetch_df()
    assert len(out) == len(want)
    out = out.sort_values("canon_url").reset_index(drop=True)
    want = want.sort_values("canon_url").reset_index(drop=True)
    assert (out["n_pages"].to_numpy() == want["n_pages"].to_numpy()).all()
    assert (out["rep_page_id"].to_numpy() == want["rep_page_id"].to_numpy()).all()


def _register_views(con, sf_dir):
    import glob

    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].removesuffix(".parquet")
        con.execute(f"create view {name} as select * from read_parquet('{p}')")


def test_jsonl_roundtrip_escaping(tmp_path):
    """JSON-hostile strings (quotes, backslashes, newlines, unicode,
    control bytes) survive the pandas-write / pyarrow-read trip."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from aerial_conversion_ray.sources.jsonl import read_jsonl, write_jsonl

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ['say "hi"\\now', "tab\there", "unié中", "back\\\\slash"],
        }
    )
    df["shard_key"] = df["doc_id"] % 2
    ds = ray.data.from_pandas(df)
    write_jsonl(ds, str(tmp_path), "shard_key", ["doc_id", "text"]).materialize()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    back = (
        read_jsonl(str(tmp_path), schema)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, df[["doc_id", "text"]])


def test_warc_roundtrip_separator_in_payload(tmp_path):
    """Content-Length framing must survive payloads that CONTAIN the
    header/record separator bytes."""
    import numpy as np
    import pandas as pd
    import ray.data

    from aerial_conversion_ray.sources.warc import read_warc, write_warc

    payloads = [b"plain", b"has\r\n\r\nseparator inside", b"WARC/1.0\r\nfake header"]
    df = pd.DataFrame(
        {
            "page_id": np.arange(3, dtype=np.int64),
            "url": [f"https://x.example/{i}" for i in range(3)],
            "warc_ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:01", "2024-01-01 00:00:02"]
            ).astype("datetime64[us]"),
            "html": payloads,
            "shard_key": np.array([0, 0, 1], np.int64),
        }
    )
    write_warc(ray.data.from_pandas(df), str(tmp_path), "shard_key").materialize()
    back = read_warc(str(tmp_path)).to_pandas().sort_values("page_id").reset_index(drop=True)
    assert list(back["html"]) == payloads
    assert list(back["url"]) == list(df["url"])
    assert list(back["warc_ts"]) == list(df["warc_ts"])


def test_csv_roundtrip_quoting(tmp_path):
    """RFC 4180-hostile strings (commas, quotes, newlines) survive the
    pandas-write / pyarrow-read trip."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from aerial_conversion_ray.sources.csv import read_csv, write_csv

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ['a,b', 'say "hi"', 'line1\nline2', '123'],
        }
    )
    df["shard_key"] = df["doc_id"] % 2
    write_csv(ray.data.from_pandas(df), str(tmp_path), "shard_key", ["doc_id", "text"]).materialize()
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    back = (
        read_csv(str(tmp_path), schema)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, df[["doc_id", "text"]])


def test_warc_gz_member_per_record(tmp_path):
    """Compressed shards contain one INDEPENDENT gzip member per
    record (Common Crawl layout), and the reader inflates them all."""
    import os
    import zlib

    import numpy as np
    import pandas as pd
    import ray.data

    from aerial_conversion_ray.sources.warc import read_warc, write_warc

    df = pd.DataFrame(
        {
            "page_id": np.arange(5, dtype=np.int64),
            "url": [f"https://x.example/{i}" for i in range(5)],
            "warc_ts": pd.to_datetime(["2024-01-01"] * 5).astype("datetime64[us]"),
            "html": [f"payload {i}".encode() for i in range(5)],
            "shard_key": np.zeros(5, np.int64),
        }
    )
    write_warc(
        ray.data.from_pandas(df), str(tmp_path), "shard_key", compress=True
    ).materialize()
    path = os.path.join(str(tmp_path), "shard=0", "data.warc.gz")
    data = open(path, "rb").read()
    members = 0
    rest = data
    while rest:
        d = zlib.decompressobj(47)
        d.decompress(rest)
        rest = d.unused_data
        members += 1
    assert members == 5
    back = read_warc(str(tmp_path)).to_pandas().sort_values("page_id")
    assert list(back["html"]) == list(df["html"])
