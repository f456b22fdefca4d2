"""Training-data operator tests: dedup suite, ANN, text analysis,
multimodal stubs, event windows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from argo_ray.functions.ann import CosineTopK, _normalize, lsh_bucketed_topk
from argo_ray.functions.dedup import (
    PLANT_OFFSET,
    charset_jaccard_pairs_group,
    jaccard_shingles,
    plant_duplicates_batch,
)
from argo_ray.functions.multimodal import BinaryFeatureExtractor, ImageDecoder
from argo_ray.functions.text import (
    LangId,
    quality_batch,
    rolling_fingerprints,
    simhash64,
    simhash_batch,
    token_count_batch,
)

from conftest import SF_DIR


def test_token_count_vectorized():
    b = pa.table({"text": ["a b c", "one", "x y"]})
    assert token_count_batch(b)["n_tokens"].to_pylist() == [3, 1, 2]


def test_quality_batch():
    b = pa.table({"text": ["a bb ccc", "word"]})
    out = quality_batch(b, short_words=2)
    assert out["n_words"].to_pylist() == [3, 1]
    assert out["n_chars_text"].to_pylist() == [8, 4]
    assert out["n_spaces"].to_pylist() == [2, 0]
    assert out["is_short"].to_pylist() == [False, True]


def test_simhash_properties():
    a = simhash64("the quick brown fox jumps over the lazy dog".split())
    b = simhash64("the quick brown fox jumps over the lazy dog".split())
    c = simhash64("completely different words entirely here now".split())
    assert a == b  # deterministic
    ham_ac = bin(a ^ c).count("1")
    # near-identical docs should be closer than unrelated ones
    d = simhash64("the quick brown fox jumps over the lazy cat".split())
    assert bin(a ^ d).count("1") < ham_ac


def test_langid_heuristic():
    model = LangId()
    assert model.predict("the cat and the dog of a house") == "en"
    assert model.predict("el perro y la casa de los gatos") == "es"
    assert model.predict("") == "und"


def test_rolling_fingerprints_deterministic():
    f1 = rolling_fingerprints("hello world, this is content-defined chunking")
    f2 = rolling_fingerprints("hello world, this is content-defined chunking")
    assert f1 == f2 and len(f1) > 0


def test_plant_duplicates():
    b = pa.table(
        {"doc_id": list(range(25)), "text": [f"t {i} x y z" for i in range(25)],
         "source": ["s"] * 25}
    )
    out = plant_duplicates_batch(b, every=10)
    assert out.num_rows == 25 + 3  # ids 0, 10, 20
    planted = out.filter(pa.compute.greater_equal(out["doc_id"], PLANT_OFFSET))
    assert planted["text"].to_pylist() == ["t 0 x y z", "t 10 x y z", "t 20 x y z"]
    near = plant_duplicates_batch(b, every=10, near=True)
    assert near.filter(
        pa.compute.equal(near["doc_id"], PLANT_OFFSET)
    )["text"].to_pylist() == ["t 0 x y"]


def test_jaccard_shingles():
    assert jaccard_shingles("a b c d", "a b c d") == 1.0
    assert jaccard_shingles("a b c d e", "a b c d") == pytest.approx(2 / 3)
    assert jaccard_shingles("a b c", "x y z") == 0.0


def test_charset_jaccard_matches_duckdb():
    import duckdb

    texts = ["abc def", "fed cba", "xyz", "abc defg"]
    g = pd.DataFrame({"doc_id": range(4), "text": texts, "source": "s"})
    ours = charset_jaccard_pairs_group(g, threshold=0.0)
    con = duckdb.connect()
    con.register("t", g)
    theirs = con.execute(
        "select a.doc_id, b.doc_id, jaccard(a.text, b.text) from t a join t b on a.doc_id < b.doc_id"
    ).fetchall()
    # full-threshold-0 pair set must match pair-for-pair on j >= 0
    assert len(ours) == len(theirs)
    ours1 = charset_jaccard_pairs_group(g, threshold=1.0)
    expected_identical = {(a, b) for a, b, j in theirs if j >= 1.0}
    assert set(zip(ours1["doc_a"], ours1["doc_b"])) == expected_identical


def test_cosine_topk_stage_matches_numpy():
    rng = np.random.RandomState(0)
    corpus = rng.standard_normal((50, 8))
    qids = [1, 3]
    stage = CosineTopK((qids, corpus[qids]), k=5)
    batch = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array([r.tolist() for r in corpus], pa.list_(pa.float64())),
        }
    )
    out = stage(batch).to_pandas()
    nm = _normalize(corpus)
    for qi, qid in enumerate(qids):
        scores = nm[qid] @ nm.T
        scores[qid] = -np.inf
        top = set(np.argsort(-scores)[:5])
        got = set(out[out["query_id"] == qid]["vec_id"])
        assert got == top


def test_binary_feature_extractor():
    stage = BinaryFeatureExtractor()
    b = pa.table(
        {"item_id": pa.array([1, 2], pa.int64()), "payload": [b"hello", b""]}
    )
    out = stage(b)
    assert out["payload_len"].to_pylist() == [5, 0]
    import hashlib

    assert out["payload_md5"][0].as_py() == hashlib.md5(b"hello").hexdigest()
    assert len(out["embedding"][0].as_py()) == 16
    # deterministic
    assert stage(b).equals(out)


def test_image_decoder_real_and_fake():
    import hashlib

    from argo_ray.functions.multimodal import decode_bmp, decode_ppm, encode_bmp_gray

    # unsupported format (needs absent codec libs) → NotImplementedError
    with pytest.raises(NotImplementedError, match="BMP/PPM"):
        ImageDecoder(fake=False)._decode(b"\x89PNG1234" * 8)
    fake = ImageDecoder(fake=True)
    out = fake(pa.table({"item_id": pa.array([1], pa.int64()), "payload": [b"img"]}))
    assert out["height"][0].as_py() == 8
    assert len(out["pixels"][0].as_py()) == 64

    # REAL BMP round-trip incl. non-square row padding and bottom-up rows
    gray = bytes(range(15))
    h, w, c, px = decode_bmp(encode_bmp_gray(3, 5, gray))
    assert (h, w, c) == (3, 5, 3)
    assert bytes(px[3 * i] for i in range(15)) == gray  # top-down row-major
    # REAL PPM/PGM with comments
    assert decode_ppm(b"P6 # c\n2 2 255\n" + bytes(range(12))) == (
        2, 2, 3, bytes(range(12)),
    )
    assert decode_ppm(b"P5\n4 2\n255\n" + bytes(range(8)))[:3] == (2, 4, 1)
    # poison image quarantine: truncated BMP skipped, good row survives
    good = encode_bmp_gray(8, 8, hashlib.md5(b"x").digest() * 4)
    dec = ImageDecoder(on_error="skip")
    out = dec(
        pa.table(
            {
                "item_id": pa.array([1, 2, 3], pa.int64()),
                "payload": [good, good[:30], b"junk"],
            }
        )
    )
    assert out["item_id"].to_pylist() == [1]


def test_png_codec_roundtrip_all_filters_and_variants():
    import struct
    import zlib

    import numpy as np

    from argo_ray.functions.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
        sniff_decode,
    )

    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        for ft in range(5):
            h, w = 5, 7
            px = rng.randint(0, 256, size=h * w * ch, dtype=np.uint8).tobytes()
            assert decode_png(encode_png(h, w, px, ch, ft)) == (h, w, ch, px)
    # sniff dispatch sees the real signature
    p = encode_png(2, 2, bytes(range(12)), channels=3, filter_type=4)
    assert sniff_decode(p) == (2, 2, 3, bytes(range(12)))
    # poison: truncated / corrupt-IDAT / headerless → ValueError (quarantine)
    for bad in (p[:20], _PNG_SIG + b"garbagegarbage", _PNG_SIG):
        with pytest.raises(ValueError):
            decode_png(bad)
    # unsupported variants (16-bit, bad color type, Adam7) quarantine
    # loudly (palette (3) is now SUPPORTED — see test_png_palette_decode)
    for depth, color, inter in ((16, 0, 0), (8, 7, 0), (8, 0, 1)):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, inter)
        v = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported PNG"):
            decode_png(v)
    # ImageDecoder quarantines poison PNGs but keeps good ones
    dec = ImageDecoder(on_error="skip")
    out = dec(
        pa.table(
            {
                "item_id": pa.array([1, 2], pa.int64()),
                "payload": [p, p[:20]],
            }
        )
    )
    assert out["item_id"].to_pylist() == [1]
    assert out["channels"].to_pylist() == [3]


def test_jpeg_codec_baseline():
    import hashlib

    import numpy as np

    from argo_ray.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
        encode_jpeg_rgb,
    )
    from argo_ray.functions.multimodal import sniff_decode

    # exact constant-block roundtrip (the oracle fixture contract):
    # pure-DC blocks with the DC-quantizer-8 table are bit-exact
    d = hashlib.md5(b"hello").digest()
    tiles = np.zeros((32, 32), np.uint8)
    for j, byte in enumerate(d):
        tr, tc = divmod(j, 4)
        tiles[tr * 8 : tr * 8 + 8, tc * 8 : tc * 8 + 8] = byte
    p = encode_jpeg_gray(32, 32, tiles.tobytes())
    assert decode_jpeg(p) == (32, 32, 1, tiles.tobytes())
    # restart intervals decode identically (DRI/RSTn path)
    p_rst = encode_jpeg_gray(32, 32, tiles.tobytes(), restart_interval=3)
    assert decode_jpeg(p_rst) == (32, 32, 1, tiles.tobytes())
    # sniff dispatch on the SOI magic
    assert sniff_decode(p)[3] == tiles.tobytes()

    # general gray content: near-lossless with the default table,
    # non-multiple-of-8 dims crop correctly
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(21, 19), dtype=np.uint8)
    h, w, c, out = decode_jpeg(encode_jpeg_gray(21, 19, img.tobytes()))
    assert (h, w, c) == (21, 19, 1)
    err = np.abs(
        np.frombuffer(out, np.uint8).astype(int).reshape(21, 19)
        - img.astype(int)
    ).max()
    assert err <= 2

    # color (YCbCr 4:4:4) roundtrip within color-transform rounding
    imgc = rng.randint(0, 256, size=(16, 24, 3), dtype=np.uint8)
    h, w, c, out = decode_jpeg(encode_jpeg_rgb(16, 24, imgc.tobytes()))
    assert (h, w, c) == (16, 24, 3)
    errc = np.abs(
        np.frombuffer(out, np.uint8).astype(int).reshape(16, 24, 3)
        - imgc.astype(int)
    ).max()
    assert errc <= 4

    # poison / unsupported variants quarantine loudly
    for bad in (b"\xff\xd8\xff\xda", b"junk", p[:40],
                b"\xff\xd8" + b"\xff\xc2\x00\x05aaa"):  # SOF2 progressive
        with pytest.raises(ValueError):
            decode_jpeg(bad)
    # ImageDecoder quarantines the poison JPEG, keeps the good one
    dec = ImageDecoder(on_error="skip")
    out = dec(
        pa.table(
            {
                "item_id": pa.array([1, 2], pa.int64()),
                "payload": [p, p[:40]],
            }
        )
    )
    assert out["item_id"].to_pylist() == [1]


# ---------------------------------------------------------------------------
# Distributed checks (Ray session)
# ---------------------------------------------------------------------------


def test_minhash_lsh_vs_bruteforce(ray_session):
    """LSH pairs at threshold 0.5 == brute-force shingle-Jaccard pairs
    (recall check on the planted corpus; LSH with 8x8 bands has ~1.0
    recall at J>=0.5 for this corpus size)."""
    import ray.data as rd

    from argo_ray.functions.dedup import minhash_lsh_pairs

    docs = rd.read_parquet(f"{SF_DIR}/documents.parquet").limit(120).map_batches(
        lambda b: plant_duplicates_batch(b, every=10, near=True),
        batch_format="pyarrow",
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5).take_all()
    }
    rows = docs.take_all()
    expect = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            x, y = sorted((a["doc_id"], b["doc_id"]))
            if jaccard_shingles(a["text"], b["text"]) >= 0.5:
                expect.add((x, y))
    assert expect, "fixture must contain near-dups"
    missed = expect - got
    false = got - expect
    assert not false, f"false positives: {false}"  # verify stage guarantees
    assert len(missed) / len(expect) <= 0.05, f"recall too low: missed {missed}"


def test_lsh_bucketed_topk_runs(ray_session):
    import ray.data as rd

    emb = rd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    out = lsh_bucketed_topk(emb, query_ids=[0, 1], k=5, bits=4)
    df = out.to_pandas()
    assert set(df.columns) == {"query_id", "rank", "vec_id"}
    assert (df["rank"] <= 5).all()


def test_simhash_batch_uint64(ray_session):
    b = pa.table({"doc_id": [1], "text": ["a b c"]})
    out = simhash_batch(b)
    assert out["simhash"].type == pa.uint64()


def test_neardup_components_union_find_vs_oracle(ray_session):
    """Components over the char-set Jaccard pair graph match the
    recursive-SQL transitive closure; distributed label propagation
    agrees with driver union-find."""
    import duckdb

    from argo_ray.functions.dedup import charset_jaccard_pairs, neardup_components
    from argo_ray.pipelines.data_queries import DATA_ORACLES, _docs

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    expected = {tuple(r) for r in con.execute(DATA_ORACLES["neardup_components"]).fetchall()}

    pairs = charset_jaccard_pairs(_docs(sf, ("doc_id", "text", "source")), threshold=1.0)
    got = {(r["doc_id"], r["component"]) for r in neardup_components(pairs).take_all()}
    assert got == expected
    assert len(got) > 0

    pairs2 = charset_jaccard_pairs(_docs(sf, ("doc_id", "text", "source")), threshold=1.0)
    dist = {
        (r["doc_id"], r["component"])
        for r in neardup_components(pairs2, distributed=True).take_all()
    }
    assert dist == expected


def test_ivf_topk_recall(ray_session):
    """IVF ANN: recall@10 vs exact brute force with nprobe=8/16
    cells (synthetic embeddings are near-uniform — IVF worst case); exact self-consistency of the layout."""
    from argo_ray.functions.ann import cosine_topk, ivf_topk
    from argo_ray.pipelines.data_queries import _embeddings

    sf = "/root/testdata/sf0.001"
    qids = [0, 1, 2, 3, 4]
    exact = cosine_topk(_embeddings(sf), qids, k=10).to_pandas()
    approx = ivf_topk(_embeddings(sf), qids, k=10, nlist=16, nprobe=8).to_pandas()
    assert set(approx.columns) == {"query_id", "rank", "vec_id"}
    hits = 0
    for q in qids:
        e = set(exact[exact.query_id == q].vec_id)
        a = set(approx[approx.query_id == q].vec_id)
        hits += len(e & a)
    recall = hits / (len(qids) * 10)
    assert recall >= 0.75, recall


def test_multimodal_resize_and_framesample(ray_session):
    """Decode → resize and video → frame-sample actor stages: schemas,
    batch plumbing and determinism (fake codec doubles)."""
    from argo_ray.functions.multimodal import (
        FrameSampler,
        ImageDecoder,
        ImageResizer,
        documents_as_binary,
    )

    sf = "/root/testdata/sf0.001"
    ds = documents_as_binary(sf).limit(40)
    # chained actor pools: size them so pools + read tasks fit the
    # 4-CPU test session (reservation is disabled engine-wide)
    decoded = ds.map_batches(
        ImageDecoder, batch_format="pyarrow", concurrency=1, batch_size=16,
        fn_constructor_kwargs={"fake": True},
    )
    resized = decoded.map_batches(
        ImageResizer, batch_format="pyarrow", concurrency=1, batch_size=16,
        fn_constructor_kwargs={"target_h": 4, "target_w": 4, "fake": True},
    )
    rows = resized.take_all()
    assert len(rows) == 40
    assert all(r["height"] == 4 and r["width"] == 4 for r in rows)
    assert all(len(r["pixels"]) == 16 for r in rows)

    frames = documents_as_binary(sf).limit(10).map_batches(
        FrameSampler, batch_format="pyarrow", concurrency=1, batch_size=8,
        fn_constructor_kwargs={"n_frames": 3, "fake": True},
    )
    frows = frames.take_all()
    assert len(frows) == 30
    assert {r["frame_idx"] for r in frows} == {0, 1, 2}
    # deterministic across runs
    frows2 = documents_as_binary(sf).limit(10).map_batches(
        FrameSampler, batch_format="pyarrow", concurrency=1, batch_size=8,
        fn_constructor_kwargs={"n_frames": 3, "fake": True},
    ).take_all()
    assert sorted(map(str, frows)) == sorted(map(str, frows2))

    import pytest as _pytest

    # resize is a real kernel now — default (non-fake) path works
    assert _pytest is not None
    assert len(ImageResizer()._resize(8, 8, 1, b"\0" * 64)) == 16


def test_sharded_allpairs_hot_key_equivalence(ray_session):
    """One hot source/label (every doc in one group) — the sharded
    all-pairs path must distribute the O(n²) work yet emit exactly the
    same pair set as shards=1 (VERDICT r1: unsalted all-pairs)."""
    import numpy as np
    import ray.data as rd

    from argo_ray.functions.ann import embedding_neardup_pairs
    from argo_ray.functions.dedup import charset_jaccard_pairs

    # 120 docs, ONE source; duplicates planted via 6 repeating char sets
    docs = rd.from_items(
        [
            {"doc_id": i, "source": "hot", "text": "abcdef"[: (i % 6) + 1]}
            for i in range(120)
        ]
    ).repartition(8)

    def pairset(ds):
        return {(r["doc_a"], r["doc_b"]) for r in ds.take_all()}

    base = pairset(charset_jaccard_pairs(docs, threshold=1.0, shards=1))
    salted = pairset(charset_jaccard_pairs(docs, threshold=1.0, shards=4))
    assert salted == base and len(base) > 100

    rng = np.random.default_rng(3)
    protos = rng.standard_normal((5, 16))
    emb = rd.from_items(
        [
            {
                "vec_id": i,
                "label": 0,  # one hot label
                "embedding": (protos[i % 5] + 0.01 * rng.standard_normal(16)).tolist(),
            }
            for i in range(80)
        ]
    ).repartition(8)
    base_e = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.9, shards=1).take_all()
    }
    salt_e = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.9, shards=4).take_all()
    }
    assert salt_e == base_e and len(base_e) > 50


def test_simhash_md5_hasher_matches_duckdb():
    """md5 token hash must equal DuckDB CAST('0x'||substr(md5,1,16) AS
    UBIGINT) and batch SimHash must equal the scalar path."""
    import duckdb

    from argo_ray.functions.text import _token_hashes, simhash64, simhash_batch

    toks = ["hello", "", "wörld", "a b"]
    ours = _token_hashes(toks, "md5")
    for t, h in zip(toks, ours):
        want = duckdb.connect().execute(
            "SELECT CAST(concat('0x', substr(md5(?),1,16)) AS UBIGINT)", [t]
        ).fetchone()[0]
        assert int(h) == want
    texts = ["the quick brown fox", "lorem ipsum dolor sit amet", "x"]
    b = pa.table({"doc_id": [1, 2, 3], "text": texts})
    for hasher in ("fast", "md5"):
        out = simhash_batch(b, hasher=hasher)
        assert out["simhash"].to_pylist() == [
            simhash64(t.split(" "), hasher=hasher) for t in texts
        ]


def test_broadcast_join(ray_session):
    """Map-side broadcast join: inner-join semantics match pandas merge;
    big side never shuffles (plan has no all-to-all stage)."""
    import ray.data as rd

    from argo_ray.stages.broadcast import broadcast_join

    big = rd.from_items([{"k": i % 5, "v": i} for i in range(1000)]).repartition(8)
    small = pa.table({"k": [0, 1, 2, 9], "name": ["a", "b", "c", "z"]})
    out = broadcast_join(big, small, on="k", concurrency=1)
    rows = out.take_all()
    assert len(rows) == 600  # k in {0,1,2} → 200 each
    assert {r["name"] for r in rows} == {"a", "b", "c"}
    assert all(r["v"] % 5 == r["k"] for r in rows)
    # small side as a Dataset also works
    out2 = broadcast_join(big, rd.from_arrow(small), on="k", concurrency=1)
    assert out2.count() == 600


def test_wav_and_y4m_real_codecs():
    """Real RIFF/WAVE and YUV4MPEG2 parsers: round-trips, chunk walking,
    unsupported-variant rejection."""
    import numpy as np

    from argo_ray.functions.multimodal import (
        AudioFeatures,
        FrameSampler,
        decode_wav,
        decode_y4m,
        encode_wav_pcm16,
        encode_y4m,
    )

    samples = np.arange(-5, 11, dtype=np.int16)
    rate, ch, got = decode_wav(encode_wav_pcm16(8000, samples))
    assert (rate, ch) == (8000, 1) and (got == samples).all()
    # extra chunk before data still parses (chunk walking)
    wav = encode_wav_pcm16(8000, samples)
    patched = wav[:12] + b"LIST\x04\x00\x00\x00INFO" + wav[12:]
    patched = patched[:4] + np.uint32(len(patched) - 8).tobytes() + patched[8:]
    assert (decode_wav(patched)[2] == samples).all()
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")

    frames = [bytes([i]) * 64 for i in range(10)]
    w, h, back = decode_y4m(encode_y4m(8, 8, frames))
    assert (w, h) == (8, 8) and back == frames
    with pytest.raises(ValueError, match="Cmono"):
        decode_y4m(b"YUV4MPEG2 W8 H8 C420\nFRAME\n" + b"\0" * 96)

    feats = AudioFeatures()(
        pa.table({"item_id": pa.array([1], pa.int64()),
                  "payload": [encode_wav_pcm16(8000, samples)]})
    )
    assert feats["n_samples"].to_pylist() == [16]
    assert feats["sum_sq"].to_pylist() == [int((samples.astype(np.int64) ** 2).sum())]
    assert feats["peak"].to_pylist() == [10]

    sampled = FrameSampler(n_frames=4)(
        pa.table({"item_id": pa.array([7], pa.int64()),
                  "payload": [encode_y4m(8, 8, frames)]})
    )
    assert sampled["frame_idx"].to_pylist() == [0, 3, 6, 9]
    assert sampled["pixels"].to_pylist() == [frames[i] for i in (0, 3, 6, 9)]


def test_windows_order_independent(ray_session):
    """Out-of-order event logs (the web-scale reality) must produce the
    same windows/sessions/as-of matches as time-ordered input — the
    in-block (user, ts) sort is load-bearing."""
    import ray.data as rd

    from argo_ray.stages.windows import (
        asof_join_events,
        sessionize,
        tumbling_window_agg,
    )

    events = rd.read_parquet(f"{SF_DIR}/events.parquet")
    shuffled = events.random_shuffle(seed=11)

    def rows(ds):
        return sorted(map(str, ds.take_all()))

    assert rows(tumbling_window_agg(shuffled)) == rows(tumbling_window_agg(events))
    assert rows(sessionize(shuffled)) == rows(sessionize(events))
    assert rows(asof_join_events(shuffled, "purchase", "click")) == rows(
        asof_join_events(events, "purchase", "click")
    )


def test_quality_punct_stopwords():
    b = pa.table({"text": ["the cat, and a dog!", "no stops here."]})
    out = quality_batch(b)
    assert out["n_punct"].to_pylist() == [2, 1]
    # 'the', 'and', 'a' are en stopwords; 'cat,'/'dog!' tokens are not
    assert out["n_stopwords"].to_pylist() == [3, 0]


def test_frame_sampler_poison_quarantine():
    """FrameSampler honors the on_error='skip' contract like every
    other decoder: poison videos drop, good siblings survive."""
    from argo_ray.functions.multimodal import FrameSampler, encode_y4m

    frames = [bytes([i]) * 64 for i in range(4)]
    good = encode_y4m(8, 8, frames)
    b = pa.table(
        {
            "item_id": pa.array([1, 2, 3], pa.int64()),
            "payload": [good, b"not video", good[:20]],
        }
    )
    out = FrameSampler(n_frames=2, on_error="skip")(b)
    assert set(out["item_id"].to_pylist()) == {1}
    with pytest.raises(NotImplementedError):
        FrameSampler(n_frames=2)(b)


def test_exact_dedup_fast_matches_md5_mode():
    """The vectorized 128-bit fast hasher (default) must produce the
    same dedup decision (keep_doc_id, n_copies sets) as the
    DuckDB-reproducible md5 oracle mode."""
    import ray.data as rd

    from argo_ray.functions.dedup import exact_dedup_docs

    texts = ["alpha", "beta", "alpha", "gamma", "beta", "alpha", "Δδ"]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    ds = rd.from_arrow(tbl)
    fast = exact_dedup_docs(ds).to_pandas()
    md5 = exact_dedup_docs(rd.from_arrow(tbl), hasher="md5").to_pandas()
    assert set(fast.columns) >= {"fingerprint", "fingerprint2", "keep_doc_id", "n_copies"}
    got = sorted(zip(fast["keep_doc_id"], fast["n_copies"]))
    want = sorted(zip(md5["keep_doc_id"], md5["n_copies"]))
    assert got == want == [(0, 3), (1, 2), (3, 1), (6, 1)]


def test_fingerprint_fast_mode_columns():
    from argo_ray.functions.text import fingerprint_batch

    b = pa.table({"text": ["Hello", "hello", "world"]})
    out = fingerprint_batch(b)
    assert out["fingerprint"].type == pa.uint64()
    assert out["fingerprint2"].type == pa.uint64()
    fp = out["fingerprint"].to_pylist()
    assert fp[0] == fp[1] != fp[2]  # case-folded content key
    # the two seeds are independent families
    assert out["fingerprint"].to_pylist() != out["fingerprint2"].to_pylist()


# -- sampling / splitting --------------------------------------------------


def test_hash_split_deterministic_across_partitioning(ray_session):
    import ray.data

    from argo_ray.functions.sampling import hash_split

    tbl = pa.table({"doc_id": pa.array(range(500), pa.int64())})
    fr = [("train", 0.8), ("val", 0.1), ("test", 0.1)]

    def run(nblocks):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        df = hash_split(ds, "doc_id", fractions=fr).to_pandas()
        return df.sort_values("doc_id")["split"].tolist()

    a, b = run(1), run(7)
    assert a == b  # assignment is content-keyed, not partition-keyed
    from collections import Counter

    c = Counter(a)
    assert 320 <= c["train"] <= 470 and c["val"] >= 10 and c["test"] >= 10
    with pytest.raises(ValueError):
        hash_split(
            ray.data.from_arrow(tbl), "doc_id",
            fractions=[("a", 0.5), ("b", 0.2)],
        )


def test_stratified_sample_fast_deterministic(ray_session):
    import ray.data

    from argo_ray.functions.sampling import stratified_sample

    tbl = pa.table(
        {
            "doc_id": pa.array(range(300), pa.int64()),
            "source": pa.array([f"s{i % 3}" for i in range(300)]),
        }
    )

    def run(nblocks):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        df = stratified_sample(
            ds, "source", "doc_id", n_per_stratum=5
        ).to_pandas()
        return sorted(map(tuple, df[["source", "doc_id"]].values.tolist()))

    a, b = run(1), run(6)
    assert a == b
    assert len(a) == 15  # 3 strata × 5
    from collections import Counter

    assert set(Counter(s for s, _ in a).values()) == {5}


def test_chunk_documents_batch_edges():
    from argo_ray.functions.text import chunk_documents_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["a b c d e f g", "x y", ""],
        }
    )
    out = chunk_documents_batch(t, size=4, stride=3).to_pylist()
    out.sort(key=lambda r: (r["doc_id"], r["chunk_idx"]))
    assert [r["chunk_text"] for r in out] == ["a b c d", "d e f g", "g", "x y"]
    # overlap: last token of chunk 0 is first of chunk 1 (stride < size)
    assert out[0]["chunk_text"].split()[-1] == out[1]["chunk_text"].split()[0]
    # empty docs yield no chunks; bad params fail loudly
    assert all(r["doc_id"] != 3 for r in out)
    with pytest.raises(ValueError):
        chunk_documents_batch(t, size=4, stride=5)


def test_hash_split_null_keys_unassigned(ray_session):
    import ray.data

    from argo_ray.functions.sampling import hash_split

    tbl = pa.table({"k": pa.array(["a", None, "b"], pa.large_string())})
    df = hash_split(
        ray.data.from_arrow(tbl), "k",
        splits=[("train", "cd"), ("rest", "g")], hasher="md5",
    ).to_pandas()
    assert df.loc[df["k"].isna(), "split"].isna().all()
    assert df.loc[df["k"].notna(), "split"].notna().all()


def test_hash_split_null_keys_unassigned_fast(ray_session):
    # hash64 maps null to a concrete value; the fast path must still
    # leave null keys unassigned, matching the md5 contract
    import ray.data

    from argo_ray.functions.sampling import hash_split

    tbl = pa.table({"k": pa.array(["a", None, "b"], pa.large_string())})
    df = hash_split(
        ray.data.from_arrow(tbl), "k",
        fractions=[("train", 0.8), ("val", 0.1), ("test", 0.1)],
    ).to_pandas()
    assert df.loc[df["k"].isna(), "split"].isna().all()
    assert df.loc[df["k"].notna(), "split"].notna().all()


def test_stratified_sample_fast_null_keys_rank_last(ray_session):
    import ray.data

    from argo_ray.functions.sampling import stratified_sample

    tbl = pa.table({
        "g": pa.array(["x"] * 4, pa.large_string()),
        "k": pa.array(["a", None, "b", "c"], pa.large_string()),
    })
    out = stratified_sample(
        ray.data.from_arrow(tbl), "g", "k", n_per_stratum=3
    ).to_pandas()
    # the null-key row must lose to all 3 real keys
    assert out["k"].notna().all() and len(out) == 3


def test_running_total_matches_pandas(ray_session):
    import numpy as np
    import ray.data

    from argo_ray.functions.packing import running_total

    rng = np.random.default_rng(7)
    ids = rng.permutation(500)
    vals = rng.integers(1, 100, 500)
    tbl = pa.table({"id": pa.array(ids, pa.int64()),
                    "v": pa.array(vals, pa.int64())})
    # many small blocks to force multi-block offsets
    ds = ray.data.from_arrow(tbl).repartition(13)
    out = running_total(ds, "id", "v", out_col="cum").to_pandas()
    out = out.sort_values("id").reset_index(drop=True)
    expect = out["v"].cumsum()
    assert (out["cum"] == expect).all()


def test_pack_sequences_window_assignment(ray_session):
    import ray.data

    from argo_ray.functions.packing import pack_sequences

    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "n": pa.array([300, 300, 300, 300, 300], pa.int64()),
    })
    out = (
        pack_sequences(ray.data.from_arrow(tbl), "id", "n", budget=512)
        .to_pandas().sort_values("id")
    )
    # start offsets 0,300,600,900,1200 -> windows 0,0,1,1,2
    assert list(out["seq_id"]) == [0, 0, 1, 1, 2]


def test_docs_clean_pipeline_composition(ray_session):
    from argo_ray.pipelines.data_queries import q_docs_clean_pipeline

    out = q_docs_clean_pipeline("/root/testdata/sf0.001").to_pandas()
    assert set(out["split"]) <= {"train", "val", "test"}
    assert out["doc_id"].is_unique
    # the sf fixtures plant exact duplicates, so dedup must shrink
    import pyarrow.parquet as pq
    n_docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    ).num_rows
    assert 0 < len(out) < n_docs


def test_pii_redaction_matches_duckdb():
    """Planted email/phone/IP redaction is byte-identical to the DuckDB
    regexp_replace oracle (same RE2 constants both sides)."""
    import duckdb

    from argo_ray.functions.privacy import (
        plant_pii_batch,
        redact_pii_batch,
        redact_pii_oracle_sql,
    )

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 199, 1234], pa.int64()),
            "text": ["alpha beta", "g 10.5 d", "e", "z", "k 1.2.3.4 x", "l"],
        }
    )
    got = (
        redact_pii_batch(plant_pii_batch(t))
        .select(["doc_id", "clean", "n_emails", "n_phones", "n_ips"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    want = (
        con.execute(redact_pii_oracle_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    # pre-planted IP in doc 199's text is also caught
    assert "<IP>" in got.loc[got.doc_id == 199, "clean"].iloc[0]


def test_repetition_batch_integer_exact():
    from argo_ray.functions.text import repetition_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["a a a a b", "u v w x y z", ""],
        }
    )
    out = repetition_batch(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_words"] == 5
    assert out.loc[1, "n_distinct_words"] == 2
    assert out.loc[1, "top_word_n"] == 4
    assert bool(out.loc[1, "repetitive"])  # 4*5 > 5
    assert out.loc[2, "top_word_n"] == 1
    assert not bool(out.loc[2, "repetitive"])  # 5 > 6 is false
    # empty text splits to [""] — one word, all of them "distinct"
    assert out.loc[3, "n_words"] == 1


def test_decontaminate_flags_shared_ngrams(ray_session):
    """Doc sharing a 3-gram with the eval doc (id 0) is contaminated;
    disjoint doc is not; 2-token doc is dropped (no gram)."""
    import ray.data as rd

    from argo_ray.functions.decontam import decontaminate

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": [
                "the quick brown fox jumps",
                "a lazy dog saw the quick brown fox",
                "completely different words here",
                "too short",
            ],
        }
    )
    out = (
        decontaminate(rd.from_arrow(t), every=23, concurrency=1)
        .to_pandas()
        .set_index("doc_id")
    )
    assert sorted(out.index) == [1, 2]
    assert bool(out.loc[1, "contaminated"])
    assert not bool(out.loc[2, "contaminated"])


def test_keyword_topk_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from argo_ray.functions.scoring import keyword_topk, keyword_topk_oracle_sql

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "data join data",        # 3+2+3 = 8
                "vector slow vector",    # 2+1+2 = 5
                "nothing matches here",
                "data",                  # 3
            ],
        }
    )
    got = keyword_topk(rd.from_arrow(t), k=3).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(keyword_topk_oracle_sql(k=3)).df()
    pd.testing.assert_frame_equal(got, want)
    assert got.doc_id.tolist() == [1, 2, 4]


def test_bm25_topk_matches_local_reference(ray_session):
    import math

    import ray.data as rd

    from argo_ray.functions.scoring import bm25_topk

    texts = ["data join data x", "vector slow", "data", "w w w w w w w w"]
    t = pa.table(
        {"doc_id": pa.array([1, 2, 3, 4], pa.int64()), "text": texts}
    )
    terms = ["data", "vector"]
    got = bm25_topk(rd.from_arrow(t), terms, k=4).to_pandas()
    toks = [s.split(" ") for s in texts]
    N, avgdl = len(toks), sum(map(len, toks)) / len(toks)
    df = {w: sum(1 for tk in toks if w in tk) for w in terms}
    idf = {w: math.log((N - df[w] + 0.5) / (df[w] + 0.5) + 1.0) for w in terms}

    def score(tk):
        s = 0.0
        for w in terms:
            n = tk.count(w)
            if n:
                s += idf[w] * n * 2.5 / (n + 1.5 * (1 - 0.75 + 0.75 * len(tk) / avgdl))
        return s

    ref = sorted(
        ((score(tk), d) for tk, d in zip(toks, [1, 2, 3, 4]) if score(tk) > 0),
        key=lambda x: (-x[0], x[1]),
    )
    assert got.doc_id.tolist() == [d for _, d in ref]
    for (rs, _), gs in zip(ref, got.score):
        assert gs == pytest.approx(rs, abs=1e-12)


def test_parse_url_batch_quarantines_bad_urls():
    from argo_ray.functions.sampling import parse_url_batch

    t = pa.table(
        {
            "url": [
                "https://docs.example.org/src1/42",
                "not a url",
                "https://other.host.example/site-a/7",
                "https://docs.example.org/src1/notanumber",
            ]
        }
    )
    out = parse_url_batch(t)
    assert out.num_rows == 2
    assert out["site"].to_pylist() == ["src1", "site-a"]
    assert out["page_id"].to_pylist() == [42, 7]


def test_domain_cap_keeps_k_lowest_per_site(ray_session):
    import ray.data as rd

    from argo_ray.functions.sampling import domain_cap

    urls = [f"https://h.example/s{site}/{pid}" for site in (1, 2) for pid in (9, 3, 5, 1)]
    out = (
        domain_cap(rd.from_items([{"url": u} for u in urls]), k=2)
        .to_pandas()
        .sort_values(["site", "page_id"])
        .reset_index(drop=True)
    )
    assert out.values.tolist() == [["s1", 1], ["s1", 3], ["s2", 1], ["s2", 3]]


def test_kmeans_matches_local_lloyd(ray_session):
    """Distributed Lloyd's (broadcast centroids + per-batch partial
    sums) reproduces a local single-process reference exactly, and the
    objective is monotone non-decreasing."""
    import duckdb
    import ray.data as rd

    from argo_ray.functions.ann import _kmeans, _normalize, kmeans_clusters
    from conftest import SF_DIR

    emb = (
        duckdb.connect()
        .execute(
            f"SELECT * FROM read_parquet('{SF_DIR}/embeddings.parquet') ORDER BY vec_id"
        )
        .arrow()
    )
    assign_ds, cent, obj = kmeans_clusters(rd.from_arrow(emb), k=4, iters=5)
    got = (
        assign_ds.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    )
    assert all(obj[i] <= obj[i + 1] + 1e-9 for i in range(len(obj) - 1))

    m = _normalize(
        np.asarray(
            [list(x) for x in emb.column("embedding").to_pylist()], dtype=np.float64
        )
    )
    c = _kmeans(m[:2048], 4, iters=1, seed=0)
    for _ in range(5):
        asn = np.argmax(m @ c.T, axis=1)
        for j in range(4):
            if (asn == j).any():
                c[j] = m[asn == j].mean(axis=0)
        c = _normalize(c)
    ref = np.argmax(m @ c.T, axis=1)
    assert (ref == got).all()


def test_normalize_batch_matches_duckdb():
    import duckdb

    from argo_ray.functions.text import NORMALIZE_ORACLE_SQL, normalize_batch

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["  Héllo,   WORLD!!  x ", "a\tb\nc", ""],
        }
    )
    got = normalize_batch(t).select(["doc_id", "norm_text"]).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(NORMALIZE_ORACLE_SQL).df()
    pd.testing.assert_frame_equal(got, want)
    assert got.norm_text.tolist()[0] == "h llo world x"


def test_hll_sketch_accuracy_and_merge(ray_session):
    """HLL register-max merge is partition-independent and the estimate
    lands within the theoretical band (p=8 -> ~6.5% std error)."""
    import ray.data as rd

    from argo_ray.functions.sketch import hll_distinct_per_group

    t = pa.table(
        {
            "g": ["a"] * 3000 + ["b"] * 100,
            "k": pa.array(
                [i % 1000 for i in range(3000)] + list(range(40)) + [0] * 60,
                pa.int64(),
            ),
        }
    )
    one = hll_distinct_per_group(rd.from_arrow(t), "k", "g")
    many = hll_distinct_per_group(rd.from_arrow(t).repartition(7), "k", "g")
    assert one.to_pylist() == many.to_pylist()  # merge-invariant
    est = {r["g"]: r["estimate"] for r in one.to_pylist()}
    assert abs(est["a"] - 1000) / 1000 <= 0.15
    assert abs(est["b"] - 40) / 40 <= 0.15


def test_hll_rho_counts_leading_zeros():
    import numpy as np

    from argo_ray.functions.sketch import _rho

    w = np.array(
        [1 << 63, 1 << 62, 1 << 40, 0, (1 << 63) | 1], dtype=np.uint64
    )
    assert _rho(w, 56).tolist() == [1, 2, 24, 57, 1]


def test_mg_sketch_guarantee_partition_invariant(ray_session):
    """Misra-Gries merged sketch keeps every item above the n/(k+1)
    threshold regardless of partitioning."""
    import ray.data as rd

    from argo_ray.functions.sketch import mg_heavy_hitters

    # "hot" appears 30 times out of ~90 tokens -> way above n/(k+1)
    texts = ["hot " * 10 + "x y z"] * 3 + [f"w{i} v{i} u{i}" for i in range(20)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    for parts in (1, 5):
        sk = mg_heavy_hitters(rd.from_arrow(t).repartition(parts), k=10)
        assert "hot" in sk
        assert len(sk) <= 10


def test_cms_bounds_and_merge_invariance(ray_session):
    import ray.data as rd

    from argo_ray.functions.sketch import cms_counts, cms_estimate

    texts = ["hot cold " * 5] * 10 + [f"w{i} x{i}" for i in range(50)]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    g1 = cms_counts(rd.from_arrow(t))
    g7 = cms_counts(rd.from_arrow(t).repartition(7))
    assert g1 == g7  # linear merge -> partition-invariant
    n_tokens = sum(len(s.split(" ")) for s in texts)
    # "hot" appears 50 times; CMS never underestimates, overestimate
    # bounded by collisions
    est = cms_estimate(g1, "hot")
    assert 50 <= est <= 50 + 3 * n_tokens / 1024


def test_feature_hash_matches_duckdb():
    import duckdb

    from argo_ray.functions.text import feature_hash_batch, feature_hash_oracle_sql

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["a b a c", "d d d"],
        }
    )
    got = (
        feature_hash_batch(t)
        .to_pandas()
        .sort_values(["doc_id", "bucket"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    want = (
        con.execute(feature_hash_oracle_sql())
        .df()
        .sort_values(["doc_id", "bucket"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert got.groupby("doc_id")["n"].sum().tolist() == [4, 3]


def test_bpe_train_matches_sennrich_example(ray_session):
    """The classic BPE walkthrough: es (9) then est (9); encoder
    applies ranks greedily; distributed wordcount feeds the same loop."""
    import ray.data as rd

    from argo_ray.functions.bpe import BpeEncoder, bpe_train_distributed, train_bpe

    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    m = train_bpe(vocab, 6)
    assert m[0] == ("e", "s", 9)
    assert m[1] == ("es", "t", 9)
    freqs = [f for _, _, f in m]
    assert freqs == sorted(freqs, reverse=True)
    enc = BpeEncoder(m)
    assert enc.encode_word("newest") == 2  # n + ewest
    assert enc.encode_word("low") == 1
    assert enc.encode_word("zzz") == 3  # no learned merges apply

    # the distributed path learns the same merges from a corpus with
    # those word frequencies, regardless of partitioning
    texts = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    m2 = bpe_train_distributed(rd.from_arrow(t).repartition(4), n_merges=6)
    assert m2 == m

    # encoder as an actor-pool stage
    out = (
        rd.from_arrow(t)
        .map_batches(BpeEncoder, fn_constructor_args=(m,), concurrency=1,
                     batch_format="pyarrow")
        .to_pandas()
    )
    assert out.loc[out.text == "newest", "n_bpe_pieces"].iloc[0] == 2


def test_lm_surprisal_integer_exact(ray_session):
    """Unigram surprisal: floor-log2 bits vs a hand-computed model;
    partition-count must not change any score (integer sums)."""
    import ray.data as rd

    from argo_ray.functions.lm import _ilog2, fit_unigram_surprisal, lm_surprisal

    # reference slice: "a a a b" → T=4, c(a)=3, c(b)=1
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["a a a b", "a b zz", "zz zz"],
            "lang": ["en", "fr", "fr"],
        }
    )
    model, oov = fit_unigram_surprisal(rd.from_arrow(t).filter(lambda r: r["lang"] == "en"))
    assert model == {"a": 2 - 1, "b": 2 - 0}  # bits_t=2, ilog2(3)=1, ilog2(1)=0
    assert oov == 3
    assert _ilog2(1) == 0 and _ilog2(8) == 3 and _ilog2(7) == 2

    for parts in (1, 3):
        out = (
            lm_surprisal(rd.from_arrow(t).repartition(parts))
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out.loc[0, "surprisal_bits"] == 1 + 1 + 1 + 2
        assert out.loc[1, "surprisal_bits"] == 1 + 2 + 3
        assert out.loc[1, "n_oov"] == 1
        assert out.loc[2, "surprisal_bits"] == 6
        assert list(out["n_tokens"]) == [4, 3, 2]


def test_bloom_filter_membership_and_merge(ray_session):
    """Bloom: every inserted key hits; merge (= position union) is
    partition-invariant; a fresh key's hit status matches the direct
    bit test (false positives allowed, misses of inserted keys not)."""
    import ray
    import ray.data as rd

    from argo_ray.functions.sketch import BloomProbe, _bloom_positions, bloom_build

    keys = [f"key-{i}" for i in range(40)]
    t = pa.table({"doc_id": pa.array(range(40), pa.int64()), "text": keys})
    bits1 = bloom_build(rd.from_arrow(t).repartition(1), "text", log2_m=10)
    bits4 = bloom_build(rd.from_arrow(t).repartition(4), "text", log2_m=10)
    assert (bits1 == bits4).all()

    probe = BloomProbe(ray.put(bits1), 10, "text")
    out = probe(t)
    assert out["bloom_hit"].to_pylist() == [True] * 40  # no false negatives

    fresh = pa.table({"doc_id": pa.array([99], pa.int64()), "text": ["unseen-key"]})
    p1, p2 = _bloom_positions(["unseen-key"], 10)
    expect = bool(np.isin(p1, bits1)[0] and np.isin(p2, bits1)[0])
    assert probe(fresh)["bloom_hit"].to_pylist() == [expect]


def test_temperature_sample_rebalances_and_is_deterministic(ray_session):
    """sqrt(min/n) keep-prob: smallest stratum fully kept, hot stratum
    downsampled toward it; identical selection across partitionings."""
    import ray.data as rd

    from argo_ray.functions.sampling import temperature_sample

    n_hot, n_cold = 400, 25
    t = pa.table(
        {
            "doc_id": pa.array(range(n_hot + n_cold), pa.int64()),
            "lang": ["en"] * n_hot + ["fr"] * n_cold,
        }
    )
    kept = {}
    for parts in (1, 5):
        out = temperature_sample(
            rd.from_arrow(t).repartition(parts), strata_col="lang", hasher="md5"
        ).to_pandas()
        kept[parts] = sorted(out["doc_id"])
        by = out.groupby("lang").size()
        assert by["fr"] == n_cold  # smallest stratum: p = 1
        # hot stratum: E[kept] = 400 * sqrt(25/400) = 100
        assert 60 <= by["en"] <= 140
    assert kept[1] == kept[5]

    # fast-path (hash64) production mode: same shape guarantees
    fast = temperature_sample(
        rd.from_arrow(t).repartition(3), strata_col="lang", hasher="fast"
    ).to_pandas()
    byf = fast.groupby("lang").size()
    assert byf["fr"] == n_cold and 60 <= byf["en"] <= 140


def test_duplicate_spans_planted(ray_session):
    """Hand-built corpus: docs 1/2 share one 20-char span (at different
    offsets), doc 3 shares nothing, doc 4 is too short for any span,
    doc 5 repeats the shared span twice (both positions count)."""
    import ray.data as rd

    from argo_ray.functions.dedup import duplicate_spans

    shared = "ABCDEFGHIJKLMNOPQRST"  # exactly 20 chars
    assert len(shared) == 20
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": [
                    "xx" + shared + "yy",          # spans at 5 offsets; 1 dup
                    shared,                          # 1 span, dup
                    "u" * 30,                        # 11 spans, none shared
                    "tiny",                          # 0 spans
                    shared + "-" + shared,           # dup at 2 matching offsets
                ],
            }
        )
    )
    out = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in duplicate_spans(docs, L=20).take_all()
    }
    assert out[4] == (0, 0)
    assert out[3] == (11, 0)
    assert out[2] == (1, 1)
    assert out[1] == (5, 1)
    # doc 5: 22 spans; exactly the two aligned copies of `shared` match
    # other docs (the straddling windows contain '-', unseen elsewhere)
    assert out[5] == (22, 2)


def test_tfidf_topk_planted(ray_session):
    """3-doc corpus with a hand-checkable tf-idf ordering: 'rare' only
    in doc 1 (idf=ln 3) beats 'common' (idf=0, everywhere) even at
    higher tf; ranks are 1-based and capped at k."""
    import math

    import ray.data as rd

    from argo_ray.functions.text import tfidf_topk

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "common common common rare",
                    "common mid",
                    "common mid",
                ],
            }
        )
    )
    rows = tfidf_topk(docs, k=2).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert [r["word"] for r in d1] == ["rare", "common"]
    assert d1[0]["tf"] == 1 and d1[0]["df"] == 1
    assert abs(d1[0]["tfidf"] - round(math.log(3.0), 4)) < 1e-9
    # 'common' appears in all docs -> idf = ln(1) = 0
    assert d1[1]["tfidf"] == 0.0
    d2 = sorted(by_doc[2], key=lambda r: r["rank"])
    assert [r["word"] for r in d2] == ["mid", "common"]
    assert abs(d2[0]["tfidf"] - round(math.log(1.5), 4)) < 1e-9


def test_dsir_logweights_favor_target_slice(ray_session):
    """DSIR semantic gate: on the real corpus, English documents must
    score a higher MEAN importance logweight than non-English ones
    (the model was fitted on the English slice)."""
    from argo_ray.functions.dsir import dsir_logweights
    from argo_ray.pipelines.data_queries import _docs

    docs = _docs(SF_DIR, ("doc_id", "text", "lang"))
    weights = {
        r["doc_id"]: r["logw"]
        for r in dsir_logweights(
            docs,
            lambda b: b.filter(pa.compute.equal(b["lang"], pa.scalar("en"))),
            n_buckets=64,
        ).take_all()
    }
    langs = {
        r["doc_id"]: r["lang"]
        for r in docs.select_columns(["doc_id", "lang"]).take_all()
    }
    en = [w for d, w in weights.items() if langs[d] == "en"]
    other = [w for d, w in weights.items() if langs[d] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)


def test_image_ahash_dedup_groups_identical_images(ray_session):
    """aHash over the real BMP decode: identical texts yield identical
    images and must share a hash + keep_id; the hash is the 64-bit
    mean-threshold pattern of the 8x8 grayscale."""
    from argo_ray.functions.multimodal import image_ahash_dedup

    rows = {r["item_id"]: r for r in image_ahash_dedup(SF_DIR).take_all()}
    assert len(rows) == 500
    assert all(len(r["ahash"]) == 64 and set(r["ahash"]) <= {"0", "1"}
               for r in rows.values())
    # the corpus plants exact text duplicates (dedup fixtures) → at
    # least one hash group with >1 member, and keep_id = group min
    from collections import defaultdict

    groups = defaultdict(list)
    for r in rows.values():
        groups[r["ahash"]].append(r)
    multi = [g for g in groups.values() if len(g) > 1]
    assert multi
    for g in groups.values():
        assert {r["keep_id"] for r in g} == {min(r["item_id"] for r in g)}


def test_weighted_reservoir_favors_heavy_docs(ray_session):
    """A-ES semantic gate: the weighted sample's mean weight must
    exceed the corpus mean (heavier docs are proportionally more
    likely), and the draw is deterministic."""
    import duckdb

    from argo_ray.functions.sampling import weighted_reservoir_topk
    from argo_ray.pipelines.data_queries import _docs

    docs = _docs(SF_DIR, ("doc_id", "text", "n_chars"))
    out = weighted_reservoir_topk(docs, k=50)
    again = weighted_reservoir_topk(docs, k=50)
    assert out.equals(again)  # deterministic draw
    mean_w = sum(out["w"].to_pylist()) / out.num_rows
    corpus_mean = duckdb.sql(
        f"SELECT AVG(n_chars) AS m FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df().m[0]
    assert mean_w > corpus_mean


def test_bigram_surprisal_hand_case(ray_session):
    """Hand-checkable bigram scoring: model fitted on one 'en' doc;
    known transitions cost ilog2(c1(prev)) - ilog2(c2), unseen
    transitions back off to unigram + 2 bits, unseen words to
    bits_t + 3."""
    import ray
    import ray.data as rd

    from argo_ray.functions.lm import BigramScorer, fit_bigram_surprisal

    ref_text = "a b a b a c"  # c1: a=3 b=2 c=1, T=6; c2: ab=2 ba=2 ac=1
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": [ref_text, "a b a z"],
                "lang": ["en", "de"],
            }
        )
    )
    ref = docs.map_batches(
        lambda b: b.filter(pa.compute.equal(b["lang"], pa.scalar("en"))),
        batch_format="pyarrow",
    )
    model = fit_bigram_surprisal(ref)
    out = {
        r["doc_id"]: r
        for r in docs.map_batches(
            BigramScorer,
            fn_constructor_args=(ray.put(model),),
            batch_format="pyarrow",
            concurrency=1,
        ).take_all()
    }
    # T=6 -> bits_t=2.  doc 2 transitions: a->b seen (ilog2(3)-ilog2(2)
    # = 1-1 = 0), b->a seen (ilog2(2)-ilog2(2) = 0), a->z OOV backoff
    # (2 + 2 + 1 = 5).  Total = 5, backoffs = 1, transitions = 3.
    assert out[2]["n_transitions"] == 3
    assert out[2]["n_backoff"] == 1
    assert out[2]["bigram_bits"] == 5
    # doc 1 (the reference itself): a->b 0, b->a 0, a->b 0, b->a 0,
    # a->c = ilog2(3)-ilog2(1) = 1 -> total 1, no backoff
    assert out[1]["n_transitions"] == 5
    assert out[1]["n_backoff"] == 0
    assert out[1]["bigram_bits"] == 1


def test_semdedup_kmeans_composition_matches_bruteforce(ray_session):
    """SemDeDup composed with the k-means assignment must equal the
    local brute-force rule: drop v iff a smaller-id same-cluster vector
    exceeds the cosine threshold (chain semantics included: c drops
    because of an already-dropped b)."""
    import duckdb
    import ray.data as rd

    from argo_ray.functions.ann import _normalize, kmeans_clusters, semdedup
    from conftest import SF_DIR

    emb = (
        duckdb.connect()
        .execute(
            f"SELECT vec_id, embedding FROM read_parquet('{SF_DIR}/embeddings.parquet') "
            "ORDER BY vec_id LIMIT 200"
        )
        .arrow()
    )
    assign_ds, _c, _o = kmeans_clusters(rd.from_arrow(emb), k=3, iters=3)
    assign_df = assign_ds.to_pandas()
    with_cluster = emb.to_pandas().merge(assign_df[["vec_id", "cluster"]], on="vec_id")
    out = semdedup(
        rd.from_pandas(with_cluster), threshold=0.3, group_col="cluster"
    ).to_pandas()
    got = dict(zip(out["vec_id"], out["kept"]))

    ids = emb.column("vec_id").to_pylist()
    m = _normalize(
        np.asarray([list(x) for x in emb.column("embedding").to_pylist()],
                   dtype=np.float64)
    )
    asn = dict(zip(assign_ds.to_pandas()["vec_id"], assign_ds.to_pandas()["cluster"]))
    s = m @ m.T
    for j, vj in enumerate(ids):
        expect = not any(
            s[i, j] > 0.3 and asn[ids[i]] == asn[vj]
            for i in range(j)
        )
        assert got[vj] == expect, vj
    assert not all(out["kept"])  # the fixture does contain near-dups


def test_url_canonicalization_hand_cases():
    import pyarrow as pa

    from argo_ray.functions.urlnorm import canonical_url_array

    cases = {
        "HTTPS://WWW.Docs.Example.org:443/a/?utm_source=f&utm_medium=r#x":
            "https://docs.example.org/a",
        "http://site.example.org:80//a//b/?utm_campaign=x&ref=rss":
            "http://site.example.org/a/b/?ref=rss",
        "https://example.org/?gclid=abc": "https://example.org",
        "https://example.org/path?q=1&fbclid=z&r=2":
            "https://example.org/path?q=1&r=2",
        "https://example.org/unchanged?q=1": "https://example.org/unchanged?q=1",
    }
    got = canonical_url_array(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())


def test_surt_key_hand_cases():
    import duckdb
    import pyarrow as pa

    from argo_ray.functions.urlnorm import surt_key_array

    cases = {
        "https://docs.example.org/crawl/42": "org,example,docs)/crawl/42",
        "https://example.org": "org,example)",
        "http://a.b.c.example.org/p?q=1": "org,example,c,b,a)/p?q=1",
        "https://localhost/x": "localhost)/x",
        # schemeless input: host is still the leading [^/?]* run
        "example.com/path": "com,example)/path",
    }
    got = surt_key_array(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())
    # parity with the DuckDB oracle expression on the same inputs
    con = duckdb.connect()
    sql = r"""SELECT array_to_string(list_reverse(string_split(
        regexp_extract(regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.\-]*://', ''),
                       '^([^/?]*)', 1), '.')), ',')
      || ')' || regexp_replace(regexp_replace(u,
           '^[A-Za-z][A-Za-z0-9+.\-]*://', ''), '^[^/?]*', '')
      FROM (SELECT unnest(?) AS u)"""
    oracle = [r[0] for r in con.execute(sql, [list(cases)]).fetchall()]
    assert got == oracle


def test_nfc_audit_recomposition():
    import pyarrow as pa

    from argo_ray.functions.text import nfc_audit_batch

    decomposed = "cafe\u0301"  # e + combining acute
    b = pa.table({"doc_id": [1, 2], "text": [decomposed, "plain"]})
    out = nfc_audit_batch(b)
    assert out["nfc_text"].to_pylist() == ["caf\u00e9", "plain"]
    assert out["n_before"].to_pylist() == [5, 5]
    assert out["n_after"].to_pylist() == [4, 5]
    assert out["changed"].to_pylist() == [True, False]


def test_main_content_line_density():
    import hashlib

    import pyarrow as pa

    from argo_ray.functions.text import main_content_batch

    prose = "one two three four five six seven eight"  # exactly 8 words
    body = "\n".join(["Nav Bar", prose, "short line", prose, "© footer"])
    b = pa.table({"doc_id": [1, 2], "body": [body, "all short\nhere"]})
    out = main_content_batch(b, min_words=8)
    assert out["n_lines"].to_pylist() == [5, 2]
    assert out["n_kept"].to_pylist() == [2, 0]
    expected = prose + "\n" + prose
    assert out["main_chars"].to_pylist() == [len(expected), 0]
    assert out["main_fp"].to_pylist() == [
        hashlib.md5(expected.encode()).hexdigest(),
        hashlib.md5(b"").hexdigest(),
    ]


def test_blocklist_threshold_exact_cross_multiply():
    import pyarrow as pa

    from argo_ray.functions.text import blocklist_batch

    # 3 blocked in 49 words: density 3/49 > 3/50 -> must be dropped
    text49 = "slow dup hash " + "word " * 45 + "end"
    assert len(text49.split(" ")) == 49
    b = pa.table({"doc_id": [1], "text": [text49]})
    out = blocklist_batch(b, ("slow", "dup", "hash"), max_blocked_per_50_words=3)
    assert out["kept"].to_pylist() == [False]
    # 3 blocked in 51 words: density 3/51 < 3/50 -> kept
    text51 = "slow dup hash " + "word " * 47 + "end"
    assert len(text51.split(" ")) == 51
    b = pa.table({"doc_id": [1], "text": [text51]})
    out = blocklist_batch(b, ("slow", "dup", "hash"), max_blocked_per_50_words=3)
    assert out["kept"].to_pylist() == [True]


def test_url_canon_schemeless_matches_duckdb():
    import duckdb
    import pyarrow as pa

    from argo_ray.functions.urlnorm import canonical_url_array

    raw = "example.com/path?utm_source=x&q=1"
    got = canonical_url_array(pa.array([raw])).to_pylist()
    # DuckDB regexp_extract yields '' on no match; parity must hold
    assert got == ["://example.com/path?q=1"]
    assert got[0] is not None


def test_value_quantiles_cents_empty_input(ray_session):
    """Empty event stream → empty (q, cents) table, not an IndexError
    (rank=max(1,ceil(q*0)) used to index into an empty values array)."""
    import pyarrow as pa
    import ray

    from argo_ray.stages.windows import value_quantiles_cents

    empty = ray.data.from_arrow(
        pa.table({"value": pa.array([], pa.float64())})
    )
    out = value_quantiles_cents(empty, qs=(0.5, 0.9))
    assert out.num_rows == 0
    assert out.column_names == ["q", "cents"]


def test_ann_missing_query_id_raises_value_error(ray_session):
    """All four ANN entry points fail identically on an unknown query id:
    ValueError naming the missing ids (pq_topk used to KeyError while
    cosine_topk silently dropped them)."""
    import pytest

    from argo_ray.functions.ann import cosine_topk, ivf_topk, lsh_bucketed_topk, pq_topk
    from argo_ray.pipelines.data_queries import _embeddings

    sf = "/root/testdata/sf0.001"
    bad = [0, 10_000_000]
    for fn, kwargs in (
        (cosine_topk, {}),
        (ivf_topk, {"nlist": 4, "nprobe": 2, "train_size": 64}),
        (lsh_bucketed_topk, {"bits": 4}),
        (pq_topk, {"m": 4, "train_size": 64}),
    ):
        with pytest.raises(ValueError, match="10000000"):
            fn(_embeddings(sf), bad, k=3, **kwargs)


def test_minhasher_backend_fixed_per_actor():
    """The shingle-hash backend is decided once in __init__ (polars
    probe), never per batch — heterogeneous fallback would mix hash
    families across batches and split LSH buckets silently."""
    import numpy as np
    import pyarrow as pa

    from argo_ray.functions.dedup import MinHasher

    h = MinHasher(num_hashes=8)
    assert isinstance(h._use_polars, bool)
    batch = pa.table({"doc_id": [1, 2], "text": ["a b c d e", "a b c d e"]})
    out = h(batch)
    sigs = out["signature"].to_pylist()
    assert sigs[0] == sigs[1]
    # forcing the blake2b family still yields deterministic signatures
    h2 = MinHasher(num_hashes=8)
    h2._use_polars = False
    out2 = h2(batch)
    assert out2["signature"].to_pylist()[0] == out2["signature"].to_pylist()[1]
    assert np.asarray(sigs[0]).dtype is not None


def test_knn_graph_exact_stage_matches_numpy():
    """_KnnGraphExact over one batch: per-row top-k equals a numpy
    reference with (score desc, dst asc) tie order."""
    from argo_ray.functions.ann import _KnnGraphExact, _normalize

    rng = np.random.RandomState(3)
    corpus = rng.standard_normal((40, 6))
    ids = list(range(40))
    stage = _KnnGraphExact((ids, corpus), k=5)
    batch = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([r.tolist() for r in corpus], pa.list_(pa.float64())),
        }
    )
    out = stage(batch).to_pandas()
    assert len(out) == 40 * 5
    nm = _normalize(corpus)
    scores = nm @ nm.T
    np.fill_diagonal(scores, -np.inf)
    for src in (0, 7, 39):
        want = list(np.argsort(-scores[src], kind="stable")[:5])
        got = list(out[out.src_id == src].sort_values("rank")["dst_id"])
        assert got == want


def test_knn_graph_ivf_recall(ray_session):
    """Bucketed kNN graph: every node recovers ≥ half its exact
    neighbors at nprobe=12/16 (measured min 0.6 at sf0.001), and the
    output is one rank-contiguous top-k block per node."""
    from argo_ray.functions.ann import knn_graph, knn_graph_ivf
    from argo_ray.pipelines.data_queries import _embeddings

    sf = "/root/testdata/sf0.001"
    exact = knn_graph(_embeddings(sf), k=10).to_pandas()
    approx = knn_graph_ivf(_embeddings(sf), k=10, nlist=16, nprobe=12).to_pandas()
    assert set(approx.columns) == {"src_id", "rank", "dst_id"}
    e_sets = exact.groupby("src_id")["dst_id"].apply(set)
    a_sets = approx.groupby("src_id")["dst_id"].apply(set)
    assert set(a_sets.index) == set(e_sets.index)
    for s in e_sets.index:
        assert len(a_sets[s] & e_sets[s]) / 10 >= 0.5, s
    ranks = approx[approx.src_id == int(e_sets.index[0])]["rank"].sort_values()
    assert list(ranks) == list(range(1, len(ranks) + 1))


def test_knn_label_vote_edge_cases(ray_session):
    """Review regressions: negative/sparse labels vote in dense class
    space (no bincount crash, ties to the smallest label); null-label
    rows are excluded from the corpus but still predicted for; a
    single-vector corpus emits no prediction."""
    import ray
    import ray.data as rd

    from argo_ray.functions.ann import _KnnLabelVote, knn_label_predict

    # negative + sparse labels: 4 identical vectors, labels [-1,-1,5,10**9]
    ids = [0, 1, 2, 3]
    mat = np.ones((4, 4), dtype=np.float64)
    stage = _KnnLabelVote((ids, mat, [-1, -1, 5, 10**9]), k=3)
    batch = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([[1.0] * 4] * 4, pa.list_(pa.float64())),
        }
    )
    out = stage(batch).to_pandas()
    # every row's 3 neighbors carry labels {-1,-1,x} -> -1 wins
    assert list(out.pred_label) == [-1, -1, -1, -1]

    # null label excluded from corpus, still predicted for
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [[1.0, 0.0], [1.0, 0.1], [0.9, 0.1]], pa.list_(pa.float64())
                ),
                "label": pa.array([7, None, 7], pa.int64()),
            }
        )
    )
    got = {r["vec_id"]: r["pred_label"] for r in knn_label_predict(ds, k=2).take_all()}
    assert set(got) == {0, 1, 2} and set(got.values()) == {7}

    # single-vector corpus: no neighbor -> no prediction row
    one = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([42], pa.int64()),
                "embedding": pa.array([[1.0, 2.0]], pa.list_(pa.float64())),
                "label": pa.array([3], pa.int64()),
            }
        )
    )
    assert knn_label_predict(one, k=5).take_all() == []


def test_extract_links_no_phantom_from_leading_href():
    """A page whose FIRST tag carries href before any '>' must not
    phantom-match (the pre-anchor segment is dropped per page)."""
    from argo_ray.functions.weblinks import extract_links_batch

    b = pa.table(
        {
            "url": pa.array(["https://p/1"], pa.string()),
            "html": pa.array(
                [b'<link href="/s.css">x<a href="https://t/">t</a>'], pa.binary()
            ),
        }
    )
    out = extract_links_batch(b)
    assert out["dst_url"].to_pylist() == ["https://t/"]


def test_gopher_gate_mean_word_length_boundaries(ray_session):
    """Cross-multiplied mean-word-length rule is EXACT at the [3,10]
    boundaries: mean exactly 3 or exactly 10 is kept, one char either
    side flips bit1."""
    import ray.data as rd

    from argo_ray.pipelines.data_queries import q_docs_gopher_gate  # noqa: F401
    import pyarrow as pa

    # build via the registered query's gate by calling the module fn on
    # a tiny in-memory dataset: reuse the same code path through a stub
    from argo_ray.pipelines import data_queries as dq

    def run(text):
        b = pa.table({"doc_id": [1], "text": [text]})
        # call the inner gate through the public query machinery:
        # emulate _docs with a one-row dataset
        ds = rd.from_arrow(b)
        orig = dq._docs
        try:
            dq._docs = lambda sf, columns=None: ds
            out = dq.q_docs_gopher_gate("ignored").take_all()[0]
        finally:
            dq._docs = orig
        return out

    word3 = "abc " * 59 + "abc"  # 60 words, mean exactly 3
    r = run(word3)
    assert r["reason_mask"] & 2 == 0
    word10 = "abcdefghij " * 59 + "abcdefghij"  # mean exactly 10
    r = run(word10)
    assert r["reason_mask"] & 2 == 0
    # 59 ten-char words + one eleven-char word -> mean > 10 -> bit1
    over = "abcdefghij " * 59 + "abcdefghijk"
    r = run(over)
    assert r["reason_mask"] & 2 == 2


def test_partition_plan_matches_local_ranks(ray_session):
    """Distributed equi-depth boundaries == the locally computed exact
    ranks on the same key set."""
    from argo_ray.functions.urlnorm import surt_key_array
    from argo_ray.pages import pages_dataset
    from argo_ray.pipelines.data_queries import q_pages_partition_plan

    got = {
        r["part"]: r["boundary"]
        for r in q_pages_partition_plan("/root/testdata/sf0.001").take_all()
    }
    urls = [
        r["url"]
        for r in pages_dataset("/root/testdata/sf0.001")
        .select_columns(["url"])
        .take_all()
    ]
    keys = sorted(surt_key_array(pa.array(urls)).to_pylist())
    n = len(keys)
    want = {i: keys[(i * n) // 8 - 1] for i in range(1, 8)}
    assert got == want


def test_png_palette_decode():
    """Palettized PNG (color type 3): PLTE expansion to RGB, tRNS to
    RGBA, out-of-range index and missing PLTE quarantine."""
    import struct
    import zlib

    import numpy as np

    from argo_ray.functions.multimodal import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png_palette,
    )

    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, size=12, dtype=np.uint8).tobytes()  # 4 entries
    idx = rng.randint(0, 4, size=6 * 5, dtype=np.uint8).tobytes()
    palarr = np.frombuffer(pal, np.uint8).reshape(-1, 3)
    iarr = np.frombuffer(idx, np.uint8)

    h, w, c, out = decode_png(encode_png_palette(6, 5, idx, pal))
    assert (h, w, c) == (6, 5, 3)
    assert out == palarr[iarr].tobytes()

    alpha = bytes([255, 128, 0, 7])
    h, w, c, out = decode_png(encode_png_palette(6, 5, idx, pal, trns=alpha))
    assert (h, w, c) == (6, 5, 4)
    aarr = np.frombuffer(alpha, np.uint8)[iarr]
    assert out == np.concatenate(
        [palarr[iarr], aarr[:, None]], axis=1
    ).tobytes()

    with pytest.raises(ValueError, match="PLTE range"):
        decode_png(encode_png_palette(1, 1, bytes([3]), bytes([1, 2, 3])))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    no_plte = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x01\x02" * 4))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(no_plte)


def test_jpeg_420_subsampling():
    """Baseline JPEG 4:2:0 (the dominant web layout): MCU = 2x2 Y
    blocks + box-averaged Cb/Cr; constant 16x16 tiles round-trip
    within color-transform rounding, restart intervals decode
    identically, and mismatched sampling factors quarantine."""
    import numpy as np

    from argo_ray.functions.jpeg import decode_jpeg, encode_jpeg_rgb

    rng = np.random.RandomState(2)
    tiles = np.zeros((32, 48, 3), np.uint8)
    for ty in range(2):
        for tx in range(3):
            tiles[ty * 16 : (ty + 1) * 16, tx * 16 : (tx + 1) * 16] = (
                rng.randint(0, 256, 3)
            )
    p = encode_jpeg_rgb(32, 48, tiles.tobytes(), subsampling="420")
    h, w, c, out = decode_jpeg(p)
    assert (h, w, c) == (32, 48, 3)
    got = np.frombuffer(out, np.uint8).reshape(32, 48, 3).astype(int)
    assert np.abs(got - tiles.astype(int)).max() <= 3

    # restart intervals on the interleaved 4:2:0 scan
    p_rst = encode_jpeg_rgb(
        32, 48, tiles.tobytes(), subsampling="420", restart_interval=2
    )
    assert decode_jpeg(p_rst)[3] == out

    # non-multiple-of-16 dims crop correctly
    img = rng.randint(0, 256, size=(30, 22, 3), dtype=np.uint8)
    h, w, c, _ = decode_jpeg(
        encode_jpeg_rgb(30, 22, img.tobytes(), subsampling="420")
    )
    assert (h, w, c) == (30, 22, 3)

    # sampling factors beyond 2 quarantine
    bad = bytearray(p)
    sof_at = bad.find(b"\xff\xc0")
    bad[sof_at + 11] = 0x33  # Y sampling 3x3 (FF C0 len2 prec h2 w2 nc cid -> samp)
    with pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(bytes(bad))
