"""Behavioral tests for the LLM-pipeline operators on constructed
inputs (the oracle corpus pins them on real tables; these pin edge
semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from accounts_receivable_data_pipeline_api_spark.operators import dedup, similarity, text
from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
    attach_binary,
    decode_features,
    frame_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog near the river bank today"),
        (2, "the  QUICK brown fox jumps over the lazy dog near the river bank today"),  # exact dup after normalization
        (3, "The quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
        (4, "Completely different content about spark shuffle partitions and joins"),
        (5, "der hund und die katze sind nicht der gleichen meinung ist das"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(docs):
    groups = dedup.exact_dedup(docs).collect()
    sizes = sorted(g["group_size"] for g in groups)
    assert sizes == [1, 1, 1, 2]  # docs 1+2 collapse
    dup_group = next(g for g in groups if g["group_size"] == 2)
    assert dup_group["keep_id"] == 1


def test_drop_exact_dups(docs):
    kept = sorted(r["doc_id"] for r in dedup.drop_exact_dups(docs).collect())
    assert kept == [1, 3, 4, 5]


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical after normalization
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0  # near dup
    assert (1, 4) not in pairs


def test_ngram_jaccard_stop_shingle_pruning(spark, sf_dir):
    """Stop-shingle pruning is SOUND: with the df cap at/above the doc
    count it is a no-op (identical pairs and scores); with a tight cap
    the pruned jaccard is a lower bound of the exact one, so the
    surviving pair set is a subset and every emitted score
    under-estimates (never inflates) the true similarity."""
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs_df = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    n_docs = docs_df.count()
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs_df, threshold=0.2).collect()
    }
    nop = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs_df, threshold=0.2, max_shingle_df=n_docs
        ).collect()
    }
    assert nop == exact
    pruned = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs_df, threshold=0.2, max_shingle_df=10
        ).collect()
    }
    assert set(pruned) <= set(exact)
    for pair, j in pruned.items():
        assert j <= exact[pair] + 1e-12, pair


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(docs, verify_threshold=0.5).collect()}
    assert (1, 2) in pairs
    assert (1, 4) not in pairs


def test_simhash_identical_and_near(docs):
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert fps[1] == fps[2]  # identical token multiset after normalization
    near = {(r["id_a"], r["id_b"]): r["hamming"] for r in dedup.simhash_near_pairs(docs, max_hamming=16).collect()}
    assert near.get((1, 2)) == 0
    assert (1, 3) in near and near[(1, 3)] > 0


def test_simhash_finer_chunks_never_lose_pairs(docs):
    """A pair colliding on a 16-bit chunk also collides on one of its
    8-bit halves, so num_chunks=8 candidates are a superset of
    num_chunks=4 — the precision/recall dial moves monotonically."""
    coarse = {(r["id_a"], r["id_b"]) for r in dedup.simhash_near_pairs(docs, max_hamming=16).collect()}
    fine = {(r["id_a"], r["id_b"]) for r in dedup.simhash_near_pairs(docs, max_hamming=16, num_chunks=8).collect()}
    assert coarse <= fine
    import pytest

    with pytest.raises(ValueError):
        dedup.simhash_near_pairs(docs, num_chunks=7)


def test_similarity_topk_ranks_self_neighbors(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),  # closest to 0
        (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = similarity.brute_force_topk(df.filter(F.col("vec_id") == 0), df, k=3).collect()
    ranked = [r["match_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [1, 2, 3]
    scores = {r["match_id"]: r["score"] for r in out}
    assert scores[3] == pytest.approx(-1.0)
    assert scores[2] == pytest.approx(0.0)


def test_lsh_topk_subset_of_bruteforce(spark, sf_dir):
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    brute = similarity.brute_force_topk(queries, emb, k=50)
    lsh = similarity.lsh_topk(queries, emb, dim=64, k=10, num_planes=4)
    brute_pairs = {(r["query_id"], r["match_id"]) for r in brute.collect()}
    lsh_rows = lsh.collect()
    assert len(lsh_rows) > 0
    # LSH scores are exact cosine; any in-bucket top hit that brute-force
    # also ranked top-50 must agree — spot check membership overlap > 0.
    lsh_pairs = {(r["query_id"], r["match_id"]) for r in lsh_rows}
    assert len(lsh_pairs & brute_pairs) > 0


def test_lsh_topk_recall_floor_sf01(spark):
    """Recall floor at the LARGEST driver SF (n=2000, auto-b=5): the
    round-3 regression was a silent recall collapse that only appeared
    as the corpus grew (0.74 at sf0.1 -> 0.28 at sf1 single-table);
    this pins the sf0.1 floor, scripts/scale_probe.py pins sf1."""
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    lsh = {
        (r["query_id"], r["match_id"])
        for r in similarity.lsh_topk(queries, emb, dim=64, k=10).collect()
    }
    brute = {
        (r["query_id"], r["match_id"])
        for r in similarity.brute_force_topk(queries, emb, k=10).collect()
    }
    assert len(lsh & brute) / len(brute) >= 0.5


def test_lsh_topk_auto_table_sizing():
    """The analytic sizing law: per-table retrieval probability falls as
    auto-b grows, auto-L rises to compensate, and past max_tables the
    operator raises instead of silently degrading."""
    import math

    # Charikar agreement probability at the design point
    p = 1.0 - math.acos(0.5) / math.pi
    # radius-2 ball over b=9 planes (the sf1 shape)
    p1 = similarity.expected_lsh_topk_recall(9, 2, 0.5, num_tables=1)
    expect = sum(math.comb(9, i) * p ** (9 - i) * (1 - p) ** i for i in range(3))
    assert p1 == pytest.approx(expect)
    # OR-construction: 3 tables lift 0.38 -> ~0.76
    assert similarity.expected_lsh_topk_recall(9, 2, 0.5, num_tables=3) >= 0.67
    # monotonicity: more planes => lower per-table recall
    assert similarity.expected_lsh_topk_recall(12, 2, 0.5) < p1
    # the loud-failure branch: a target no table count under the cap can
    # reach must raise with the sizing math, not run at degraded recall
    queries = object()  # never touched — sizing happens first
    with pytest.raises(ValueError, match="max_tables"):
        similarity.lsh_topk(
            queries,
            queries,
            dim=64,
            num_planes=20,
            target_recall=0.99,
            design_cos=0.2,
            max_tables=4,
        )


def test_text_analyze(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house is in it"),
            (2, "der hund und die katze ist nicht da"),
            (3, "!!! ??? ... ###"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in text.analyze(df).collect()}
    assert rows[1]["lang_pred"] == "en"
    assert rows[2]["lang_pred"] == "de"
    assert rows[3]["lang_pred"] == "und"
    assert rows[1]["n_tokens"] == 11
    assert rows[1]["stopword_ratio"] > 0.5
    assert rows[3]["punct_ratio"] > 0.5
    assert rows[1]["quality"] > rows[3]["quality"]


def test_multimodal_plumbing(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "spark")], ["doc_id", "text"])
    media = attach_binary(df)
    rows = {r["doc_id"]: r for r in media.collect()}
    assert rows[1]["n_bytes"] == 11 and rows[1]["modality"] == "image"
    # stub fallback: deterministic fake dims for non-BMP payloads
    decoded = {r["doc_id"]: r for r in decode_features(media, decoder="stub").collect()}
    assert set(decoded) == {1, 2}
    for r in decoded.values():
        assert 1 <= r["width"] <= 1920 and 1 <= r["height"] <= 1080 and r["channels"] in (1, 2, 3)
    # determinism: same content -> same fake dims
    again = {r["doc_id"]: r for r in decode_features(media, decoder="stub").collect()}
    assert {k: (v["width"], v["height"]) for k, v in decoded.items()} == {
        k: (v["width"], v["height"]) for k, v in again.items()
    }
    frames = frame_sample(media, every_n_bytes=4).collect()
    assert sum(1 for f in frames if f["doc_id"] == 1) == 3  # offsets 0,4,8


def test_bmp_decode_real_roundtrip(spark):
    """REAL decode: synthesized BMP payloads parse back to exactly the
    geometry and pixel stream the synthesizer embedded — through the
    actual Spark mapInPandas stage, not just the pure functions."""
    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        _bmp_dims_from_text,
        synthesize_bmp,
    )
    import hashlib

    texts = [(i, f"doc {i} body " * (i + 1)) for i in range(8)]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    media = synthesize_bmp(df)
    decoded = {r["doc_id"]: r for r in decode_features(media, decoder="bmp").collect()}
    assert set(decoded) == {i for i, _ in texts}
    for i, text in texts:
        seed, w, h = _bmp_dims_from_text(text)
        r = decoded[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        row_size = (3 * w + 3) // 4 * 4
        assert r["n_bytes"] == 54 + row_size * h
        npix = w * h * 3
        digest = bytes.fromhex(seed)
        stream = (digest * ((npix + 15) // 16))[:npix]
        assert r["pixel_checksum"] == hashlib.md5(stream.hex().encode()).hexdigest()


def test_bmp_parser_padding_and_roworder():
    """The parser must strip per-row padding and undo bottom-up storage:
    a hand-built 2x2 image with distinct pixels round-trips to the
    top-down stream, and the raw file bytes differ from that stream
    (proving the flip/pad logic actually ran)."""
    import hashlib

    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        _bmp_bytes,
        _parse_bmp,
    )

    # width 2 -> row stride 6 bytes padded to 8: padding exercised
    seed = "00112233445566778899aabbccddeeff"
    content = _bmp_bytes(seed, 2, 2)
    assert len(content) == 54 + 8 * 2
    parsed = _parse_bmp(content)
    assert parsed is not None
    w, h, ch, checksum = parsed
    assert (w, h, ch) == (2, 2, 3)
    stream = bytes.fromhex(seed)[: 2 * 2 * 3]
    assert checksum == hashlib.md5(stream.hex().encode()).hexdigest()
    # bottom-up: the file's first pixel row is the LAST logical row
    assert content[54 : 54 + 6] == stream[6:12]
    # invalid payloads -> None, never an exception
    assert _parse_bmp(b"not a bmp at all") is None
    assert _parse_bmp(None) is None
    assert _parse_bmp(content[:40]) is None


def test_bmp_decode_invalid_payload_yields_nulls(spark):
    df = spark.createDataFrame([(1, "not a bmp")], ["doc_id", "text"])
    rows = decode_features(attach_binary(df), decoder="bmp").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["width"] is None and r["height"] is None and r["pixel_checksum"] is None


def test_png_decode_real_roundtrip(spark):
    """REAL compressed decode: synthesized PNGs (zlib-compressed, rows
    cycling through all five scanline filters) parse back to exactly
    the geometry and pixel stream of the BMP twin — through the actual
    Spark mapInPandas stage. A broken inflate or unfilter changes the
    pixel checksum."""
    import hashlib

    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        _bmp_dims_from_text,
        synthesize_png,
    )

    texts = [(i, f"doc {i} body " * (i + 1)) for i in range(8)]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    decoded = {
        r["doc_id"]: r
        for r in decode_features(synthesize_png(df), decoder="png").collect()
    }
    assert set(decoded) == {i for i, _ in texts}
    for i, text in texts:
        seed, w, h = _bmp_dims_from_text(text)
        r = decoded[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        npix = w * h * 3
        digest = bytes.fromhex(seed)
        stream = (digest * ((npix + 15) // 16))[:npix]
        assert r["pixel_checksum"] == hashlib.md5(stream.hex().encode()).hexdigest()


def test_png_parser_filters_crc_and_rejects():
    """Every PNG filter type must round-trip (the synthesizer cycles
    them per row), a corrupted IDAT byte must fail the CRC check, and
    non-PNG/truncated payloads return None."""
    import hashlib

    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        _parse_png,
        _png_bytes,
        _png_filter_for_row,
    )

    seed = "00112233445566778899aabbccddeeff"
    # h=10 with any w covers filters {0..4} via (r + w) % 5
    w, h = 3, 10
    assert {_png_filter_for_row(r, w) for r in range(h)} == {0, 1, 2, 3, 4}
    content = _png_bytes(seed, w, h)
    parsed = _parse_png(content)
    assert parsed is not None
    pw, ph, ch, checksum = parsed
    assert (pw, ph, ch) == (w, h, 3)
    npix = w * h * 3
    stream = (bytes.fromhex(seed) * ((npix + 15) // 16))[:npix]
    assert checksum == hashlib.md5(stream.hex().encode()).hexdigest()
    bad = bytearray(content)
    bad[50] ^= 0x01  # inside IDAT payload -> CRC mismatch
    assert _parse_png(bytes(bad)) is None
    assert _parse_png(b"not a png") is None
    assert _parse_png(None) is None
    assert _parse_png(content[:20]) is None


def test_jpeg_decode_real_roundtrip(spark):
    """REAL entropy-coded decode: synthesized baseline JPEGs (Annex-K
    Huffman tables, DC prediction, byte stuffing) parse back to exactly
    the block-constant pixel stream the fixture encodes — through the
    actual Spark mapInPandas stage. Unit quant tables + constant 8x8
    blocks make the lossy codec exact, so a Huffman/dequant/IDCT bug
    changes the pixel checksum (mirror of test_png_decode_real_roundtrip,
    per the round-6 advisory)."""
    import hashlib

    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        _jpeg_params_from_text,
        synthesize_jpeg,
    )

    texts = [(i, f"doc {i} body " * (i + 1)) for i in range(8)]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    decoded = {
        r["doc_id"]: r
        for r in decode_features(synthesize_jpeg(df), decoder="jpeg").collect()
    }
    assert set(decoded) == {i for i, _ in texts}
    for i, text in texts:
        seed, bw, bh = _jpeg_params_from_text(text)
        w, h = 8 * bw, 8 * bh
        r = decoded[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 1)
        digest = bytes.fromhex(seed)
        stream = bytes(
            digest[((y // 8) * bw + (x // 8)) % 16]
            for y in range(h)
            for x in range(w)
        )
        assert r["pixel_checksum"] == hashlib.md5(stream.hex().encode()).hexdigest()


def test_jpeg_parser_rejects_malformed():
    """Truncated/malformed segments must quarantine (None), never raise
    — the round-6 advisory's exact repro payloads plus the out-of-scope
    JPEG shapes the decoder's docstring promises to reject."""
    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        _jpeg_bytes,
        _jpeg_params_from_text,
        _parse_jpeg,
    )

    # advisory repros: empty SOS and empty SOF0 segments crashed at seg[0]
    assert _parse_jpeg(b"\xff\xd8\xff\xda\x00\x02") is None
    assert _parse_jpeg(b"\xff\xd8\xff\xc0\x00\x02") is None
    # short DHT: bits table truncated below 16 entries
    assert _parse_jpeg(b"\xff\xd8\xff\xc4\x00\x06\x00\x01\x02\x03") is None
    assert _parse_jpeg(b"\xff\xd8\xff\xc4\x00\x08\x00\x01\x02\x03\x04\x05") is None
    seed, bw, bh = _jpeg_params_from_text("reject fixture")
    good = _jpeg_bytes(seed, bw, bh)
    assert _parse_jpeg(good) is not None
    # truncated mid-scan and mid-header
    assert _parse_jpeg(good[: len(good) // 2]) is None
    assert _parse_jpeg(good[:8]) is None
    # progressive (SOF2) is out of scope: swap the SOF0 marker
    sof0_at = good.index(b"\xff\xc0")
    prog = good[:sof0_at] + b"\xff\xc2" + good[sof0_at + 2 :]
    assert _parse_jpeg(prog) is None
    # 16-bit quant tables (pq != 0) are not baseline-8
    dqt_at = good.index(b"\xff\xdb")
    deep = bytearray(good)
    deep[dqt_at + 4] = 0x10
    assert _parse_jpeg(bytes(deep)) is None
    assert _parse_jpeg(b"not a jpeg") is None
    assert _parse_jpeg(None) is None
    # huge declared dimensions over a tiny scan: must quarantine BEFORE
    # the coefficient allocation (a 65535x65535 SOF0 otherwise drives a
    # ~34 GB numpy request whose MemoryError kills the task — round-7
    # review finding)
    import struct

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    huge = (
        b"\xff\xd8"
        + seg(0xC0, struct.pack(">BHHB", 8, 65535, 65535, 1) + bytes([1, 0x11, 0]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + b"\x00\x00\xff\xd9"
    )
    assert _parse_jpeg(huge) is None


def test_jpeg420_decode_real_roundtrip(spark):
    """4:2:0 COLOR decode (the dominant real-world chroma layout):
    synthesized interleaved-MCU JPEGs (4 Y blocks + Cb + Cr per MCU,
    per-component DC prediction) parse back to exactly the RGB stream
    the fixture semantics predict — luma block-constant, chroma
    constant PER MCU (so a misaligned chroma upsample or a swapped
    block order changes the checksum), box upsampling, half-even
    rounding — through the actual Spark mapInPandas stage."""
    import hashlib

    import numpy as np

    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        _jpeg420_params_from_text,
        synthesize_jpeg420,
    )

    texts = [(i, f"doc {i} body " * (i + 1)) for i in range(8)]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    decoded = {
        r["doc_id"]: r
        for r in decode_features(synthesize_jpeg420(df), decoder="jpeg").collect()
    }
    assert set(decoded) == {i for i, _ in texts}
    for i, text in texts:
        seed, mw, mh = _jpeg420_params_from_text(text)
        w, h = 16 * mw, 16 * mh
        r = decoded[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        digest = bytes.fromhex(seed)
        exp = np.zeros((h, w, 3), dtype=np.uint8)
        for br in range(2 * mh):
            for bc in range(2 * mw):
                y = float(digest[(br * 2 * mw + bc) % 16])
                my, mx = br // 2, bc // 2
                cb = float(digest[(my * mw + mx + 5) % 16]) - 128.0
                cr = float(digest[(my * mw + mx + 11) % 16]) - 128.0
                rgb = np.clip(
                    np.rint(
                        np.array(
                            [
                                y + 1.402 * cr,
                                y - 0.344136 * cb - 0.714136 * cr,
                                y + 1.772 * cb,
                            ]
                        )
                    ),
                    0,
                    255,
                ).astype(np.uint8)
                exp[8 * br : 8 * br + 8, 8 * bc : 8 * bc + 8] = rgb
        want = hashlib.md5(exp.tobytes().hex().encode()).hexdigest()
        assert r["pixel_checksum"] == want, (i, mw, mh)


def test_jpeg_sampling_factor_scope():
    """Sampling-factor gates: 3x/4x factors quarantine (out of scope);
    a single-component SOF with nominal 2x2 factors decodes as 1:1
    (T.81 A.2.2: factors are ignored for single-component scans); a
    handcrafted 4:2:2 file (Y 2x1) decodes through the generalized
    MCU walk with horizontally box-upsampled chroma."""
    import numpy as np

    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _jpeg_bytes,
        _jpeg_canonical_codes,
        _jpeg_params_from_text,
        _jpeg_pixels,
        _JpegBitWriter,
    )

    seed, bw, bh = _jpeg_params_from_text("sampling scope fixture")
    good = _jpeg_bytes(seed, bw, bh)
    # grayscale with nominal 0x22 factors: decodes identically to 0x11
    sof0_at = good.index(b"\xff\xc0")
    relaxed = bytearray(good)
    samp_at = sof0_at + 2 + 2 + 6 + 1  # marker+len+prec/h/w/nc+cid
    assert relaxed[samp_at] == 0x11
    relaxed[samp_at] = 0x22
    base = _jpeg_pixels(good)
    assert _jpeg_pixels(bytes(relaxed)) == base
    # factor 3 is out of scope and must quarantine
    relaxed[samp_at] = 0x31
    assert _jpeg_pixels(bytes(relaxed)) is None

    # handcrafted 4:2:2: 32x8 px, Y factors (2,1) -> 2 MCU columns of
    # (2 Y blocks + Cb + Cr); chroma varies per MCU
    import struct

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    dc_codes = {
        s: (c, ln) for s, c, ln in _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    }
    ac_codes = {
        s: (c, ln) for s, c, ln in _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    }
    wr = _JpegBitWriter()
    preds = [0, 0, 0]

    def put_block(value, comp):
        dc = 8 * (value - 128)
        diff = dc - preds[comp]
        preds[comp] = dc
        s = abs(diff).bit_length()
        code, ln = dc_codes[s]
        wr.put(code, ln)
        if s:
            wr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        e, el = ac_codes[0x00]
        wr.put(e, el)

    yv = [10, 60, 110, 160]  # 4 luma blocks, left to right
    chroma = [(100, 140), (160, 90)]  # (cb, cr) per MCU
    for mcu in range(2):
        put_block(yv[2 * mcu], 0)
        put_block(yv[2 * mcu + 1], 0)
        put_block(chroma[mcu][0], 1)
        put_block(chroma[mcu][1], 2)
    payload = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + bytes([1] * 64))
        + seg(
            0xC0,
            struct.pack(">BHHB", 8, 8, 32, 3)
            + bytes([1, 0x21, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        + seg(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
        + seg(0xC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
        + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + wr.flush()
        + b"\xff\xd9"
    )
    out = _jpeg_pixels(payload)
    assert out is not None
    w, h, nc, stream = out
    assert (w, h, nc) == (32, 8, 3)
    got = np.frombuffer(stream, dtype=np.uint8).reshape(h, w, 3)
    for bc in range(4):
        y = float(yv[bc])
        cb = float(chroma[bc // 2][0]) - 128.0
        cr = float(chroma[bc // 2][1]) - 128.0
        rgb = np.clip(
            np.rint(
                np.array(
                    [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb]
                )
            ),
            0,
            255,
        ).astype(np.uint8)
        block = got[:, 8 * bc : 8 * bc + 8]
        assert (block == rgb).all(), (bc, block[0, 0], rgb)


def test_decode_auto_sniffs_per_payload(spark):
    """decoder='auto' routes each payload by magic bytes: a mixed frame
    of BMP, PNG, JPEG, and garbage decodes the three real formats
    identically to their dedicated decoders and nulls the rest."""
    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        synthesize_bmp,
        synthesize_jpeg,
        synthesize_png,
    )

    texts = [(1, "alpha doc"), (2, "beta doc"), (4, "gamma doc")]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    mixed = (
        synthesize_bmp(df.filter(F.col("doc_id") == 1))
        .unionByName(synthesize_png(df.filter(F.col("doc_id") == 2)))
        .unionByName(synthesize_jpeg(df.filter(F.col("doc_id") == 4)))
        .unionByName(attach_binary(spark.createDataFrame([(3, "junk")], ["doc_id", "text"])))
    )
    rows = {r["doc_id"]: r for r in decode_features(mixed, decoder="auto").collect()}
    assert rows[1]["pixel_checksum"] is not None
    assert rows[2]["pixel_checksum"] is not None
    assert rows[4]["pixel_checksum"] is not None and rows[4]["channels"] == 1
    jpeg_direct = {
        r["doc_id"]: r
        for r in decode_features(
            synthesize_jpeg(df.filter(F.col("doc_id") == 4)), decoder="jpeg"
        ).collect()
    }
    assert rows[4]["pixel_checksum"] == jpeg_direct[4]["pixel_checksum"]
    assert rows[3]["pixel_checksum"] is None and rows[3]["width"] is None


def test_decode_pil_gate_raises(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(NotImplementedError):
        decode_features(attach_binary(df), decoder="pil")


def test_ivf_topk_recall(spark, sf_dir):
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    centroids = similarity.ivf_build(emb, k=8, iters=3)
    assert len(centroids) == 8 and len(centroids[0]) == 64
    ivf = similarity.ivf_topk(queries, emb, centroids, k=10, nprobe=4)
    brute = similarity.brute_force_topk(queries, emb, k=10)
    ivf_pairs = {(r["query_id"], r["match_id"]) for r in ivf.collect()}
    brute_pairs = {(r["query_id"], r["match_id"]) for r in brute.collect()}
    # nprobe=4 of 8 clusters: expect >= 40% recall of exact top-10
    recall = len(ivf_pairs & brute_pairs) / len(brute_pairs)
    assert recall >= 0.4, recall
    # determinism: rebuild gives identical centroids
    again = similarity.ivf_build(emb, k=8, iters=3)
    assert centroids == again


def test_embedding_cosine_pairs_exact_symmetric(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.1, 0.0, 0.0]),   # cos(1,2) ~ 0.995
        (3, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 1
        (4, [-1.0, 0.0, 0.0, 0.0]),  # anti-parallel to 1
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {(r.id_a, r.id_b): r.score for r in dedup.embedding_cosine_pairs(df, 0.5).collect()}
    assert set(out) == {(1, 2)}
    assert abs(out[(1, 2)] - 0.995037) < 1e-6


def test_embedding_lsh_recall_and_subset(spark, sf_dir):
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.id_a, r.id_b) for r in dedup.embedding_cosine_pairs(emb, 0.3).collect()}
    lsh = {(r.id_a, r.id_b) for r in dedup.embedding_cosine_pairs_lsh(emb, 64, 0.3).collect()}
    assert lsh <= exact  # blocking never invents pairs
    # banded OR-construction (b=4, L=8): theory ~0.67 recall at cos 0.3
    assert len(exact & lsh) / len(exact) >= 0.5


def test_salted_join_equals_plain_join(spark, sf_dir):
    from accounts_receivable_data_pipeline_api_spark.operators.skew import salted_join
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_name"
    )
    salted = salted_join(
        orders, customer.withColumnRenamed("c_custkey", "o_custkey"), on=["o_custkey"]
    ).select("o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_collect_set_and_distinct(spark):
    from accounts_receivable_data_pipeline_api_spark.operators.skew import (
        salted_collect_set,
        salted_distinct_count,
    )

    rows = [("k1", v) for v in ["a", "b", "a", "c", "b"]] + [("k2", "z")]
    df = spark.createDataFrame(rows, ["k", "v"])
    cs = {r.k: list(r["values"]) for r in salted_collect_set(df, ["k"], "v").collect()}
    assert cs == {"k1": ["a", "b", "c"], "k2": ["z"]}
    dc = {r.k: r.n_distinct_v for r in salted_distinct_count(df, ["k"], "v").collect()}
    assert dc == {"k1": 3, "k2": 1}


def test_chunk_documents_roundtrip(spark):
    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        chunk_documents,
    )

    txt = "abcdefghij" * 30  # 300 chars
    df = spark.createDataFrame([(1, txt), (2, "short")], ["doc_id", "text"])
    chunks = chunk_documents(df, chunk_chars=100, overlap=20).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2 fits in one chunk, text preserved
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_text == "short"
    # doc 1: stride 80, starts 1,81,161,241 -> 4 chunks
    assert [r.chunk_start for r in sorted(by_doc[1], key=lambda r: r.chunk_idx)] == [1, 81, 161, 241]
    # consecutive chunks overlap by exactly 20 chars
    ordered = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    for a, b in zip(ordered, ordered[1:]):
        assert a.chunk_text[-20:] == b.chunk_text[:20]
    # every char of the original is covered
    rebuilt = ordered[0].chunk_text + "".join(b.chunk_text[20:] for b in ordered[1:])
    assert rebuilt == txt


def test_split_assignment_stable_and_disjoint(spark):
    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        assign_split,
        sample_by_hash,
    )

    df = spark.createDataFrame([(i,) for i in range(500)], ["doc_id"])
    s1 = {r.doc_id: r.split for r in assign_split(df, "doc_id").collect()}
    s2 = {r.doc_id: r.split for r in assign_split(df.repartition(13), "doc_id").collect()}
    assert s1 == s2  # content-addressed: layout-independent
    frac = sum(1 for v in s1.values() if v == "train") / len(s1)
    assert 0.7 < frac < 0.9
    # hash sample is a subset relation as pct grows
    p5 = {r.doc_id for r in sample_by_hash(df, "doc_id", 5).collect()}
    p20 = {r.doc_id for r in sample_by_hash(df, "doc_id", 20).collect()}
    assert p5 <= p20 and 0 < len(p5) < len(p20) < 500


def test_pack_batches_respects_budget(spark):
    from accounts_receivable_data_pipeline_api_spark.operators.curation import pack_batches

    rows = [(d, c, 100) for d in range(3) for c in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "chunk_idx", "n_tok"])
    out = pack_batches(df, "n_tok", budget=400).collect()
    sizes = {}
    for r in out:
        sizes[r.batch_id] = sizes.get(r.batch_id, 0) + r.n_tok
    # every batch except possibly the last is filled to the budget
    full = sorted(sizes)[:-1]
    assert all(sizes[b] == 400 for b in full)
    assert sum(sizes.values()) == 1500


def test_redact_pii(spark):
    rows = [
        (1, "mail me at jane.doe+x@corp.example.com or call +1 (555) 123-4567 now"),
        (2, "server at 192.168.001.1 responded"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in text.redact_pii(df).collect()}
    assert "<EMAIL>" in out[1].redacted_text and "<PHONE>" in out[1].redacted_text
    assert "jane" not in out[1].redacted_text and "555" not in out[1].redacted_text
    assert out[1].n_email == 1 and out[1].n_phone == 1
    assert out[2].redacted_text == "server at <IPV4> responded" and out[2].n_ipv4 == 1
    assert out[3].redacted_text == rows[2][1]
    assert (out[3].n_email, out[3].n_phone, out[3].n_ipv4) == (0, 0, 0)


def test_connected_components(spark):
    # components: {1,2,3,4} (chain), {10,11}, singleton {99}
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (10, 11)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 99]], ["doc_id"])
    out = {r.node: r.component for r in dedup.connected_components(pairs, nodes).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}
    star = {
        r.node: r.component
        for r in dedup.connected_components(pairs, nodes, method="star").collect()
    }
    assert star == out


def test_connected_components_self_loop_only_node(spark):
    """A node appearing ONLY in a (x, x) self-loop pair must surface as
    its own singleton component from BOTH variants even when nodes= is
    not passed — the star variant used to drop it because self-loops
    are filtered from its edge set (round-3 ADVICE)."""
    pairs = spark.createDataFrame([(1, 2), (7, 7)], ["id_a", "id_b"])
    expect = {1: 1, 2: 1, 7: 7}
    label = {r.node: r.component for r in dedup.connected_components(pairs).collect()}
    star = {
        r.node: r.component
        for r in dedup.connected_components(pairs, method="star").collect()
    }
    assert label == expect
    assert star == expect


def test_connected_components_star_equals_label_on_random_graphs(spark):
    """Property: large-star/small-star and min-label propagation
    produce the IDENTICAL (node, min-reachable-id) map on arbitrary
    graphs — seeded random graphs across densities, plus the
    adversarial long-chain case (high diameter, where the star variant
    is the one that converges in few rounds)."""
    import random

    for seed, n, n_edges in [(1, 40, 15), (2, 60, 60), (3, 30, 200)]:
        rng = random.Random(seed)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n_edges)
        ]
        pairs = [(a, b) for a, b in pairs if a != b] or [(0, 1)]
        pdf = spark.createDataFrame(pairs, ["id_a", "id_b"])
        nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
        label = {
            r.node: r.component
            for r in dedup.connected_components(pdf, nodes).collect()
        }
        star = {
            r.node: r.component
            for r in dedup.connected_components(pdf, nodes, method="star").collect()
        }
        assert star == label, (seed, {k: (v, star[k]) for k, v in label.items() if star[k] != v})

    # long chain 0-1-2-...-29: diameter 29, star must converge well
    # within max_iter (log^2 bound) and still match
    chain = spark.createDataFrame([(i, i + 1) for i in range(29)], ["id_a", "id_b"])
    label = {r.node: r.component for r in dedup.connected_components(chain, max_iter=40).collect()}
    star = {r.node: r.component for r in dedup.connected_components(chain, method="star").collect()}
    assert star == label == {i: 0 for i in range(30)}


def test_components_over_lsh_refine_exact(spark, sf_dir):
    """The scale-path clustering (components over LSH candidates) must
    be a REFINEMENT of the exact clustering: every emitted pair is
    exact-verified, so LSH misses can split true clusters but never
    merge unrelated ones — two nodes sharing an LSH component must
    share the exact component. Singletons must cover the full id set."""
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact_pairs = dedup.embedding_cosine_pairs(emb, 0.3)
    exact = {
        r.node: r.component
        for r in dedup.connected_components(
            exact_pairs, nodes=emb.select("vec_id")
        ).collect()
    }
    lsh_pairs = dedup.embedding_cosine_pairs_lsh(emb, 64, 0.3)
    approx = {
        r.node: r.component
        for r in dedup.connected_components(
            lsh_pairs, nodes=emb.select("vec_id")
        ).collect()
    }
    n_vecs = emb.count()
    assert len(approx) == n_vecs  # total keep/drop map incl. singletons
    by_comp: dict[int, list[int]] = {}
    for node, comp in approx.items():
        by_comp.setdefault(comp, []).append(node)
    for members in by_comp.values():
        assert len({exact[m] for m in members}) == 1, members


def test_brute_topk_pandas_equals_jvm(spark, sf_dir):
    """The Arrow-batched GEMM top-k (the pandas-UDF hot path) must rank
    exactly like the JVM-fold baseline — this equality is what lets the
    corpus carry a single similarity_brute_topk oracle entry for both
    implementations (round-2 registry consolidation)."""
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)

    def canon(df):
        return sorted(
            (r["query_id"], r["match_id"], r["rank"], round(r["score"], 6))
            for r in df.collect()
        )

    jvm = canon(similarity.brute_force_topk(queries, emb, k=10))
    pandas_ = canon(similarity.brute_force_topk_pandas(queries, emb, k=10))
    assert jvm == pandas_


def test_salted_distinct_equals_plain_on_real_data(spark, sf_dir):
    """salted_distinct_count must be row-identical to the plain
    COUNT(DISTINCT) aggregate on real data — this equality is what lets
    agg_salted_distinct's oracle stand in for the former
    agg_distinct_customers entry (round-2 registry consolidation)."""
    from accounts_receivable_data_pipeline_api_spark.operators.skew import (
        salted_distinct_count,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    lineitem = load_table(spark, sf_dir, "lineitem")
    salted = {
        r["l_returnflag"]: r["n_distinct_l_orderkey"]
        for r in salted_distinct_count(
            lineitem, ["l_returnflag"], "l_orderkey", num_salts=32
        ).collect()
    }
    plain = {
        r["l_returnflag"]: r["n"]
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert salted == plain


def test_approx_distinct_within_rsd(spark, sf_dir):
    """approx_count_distinct at rsd=0.01 stays within 5% of the exact
    cardinality on real data (HLL++ guarantee holds at this scale) —
    the value-level pin behind agg_approx_distinct's within_bound
    invariant column."""
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    orders = load_table(spark, sf_dir, "orders")
    approx = {
        r["o_orderstatus"]: r["a"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.01).alias("a"))
        .collect()
    }
    exact = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for status, n in exact.items():
        assert abs(approx[status] - n) <= max(0.05 * n, 2), (status, approx[status], n)


def test_decode_resize_fused_equals_staged(spark):
    """The fused single-Arrow-crossing decode_resize must be
    row-identical to the staged resize(decode_features(...)) pipeline."""
    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        decode_resize,
        resize,
    )

    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        synthesize_bmp,
    )

    df = spark.createDataFrame(
        [(i, f"document number {i} with some text") for i in range(50)],
        ["doc_id", "text"],
    )
    media = synthesize_bmp(df)
    staged = sorted(map(tuple, resize(decode_features(media)).collect()))
    fused = sorted(map(tuple, decode_resize(media).collect()))
    assert staged == fused


def test_ivf_scales_nlist_beyond_codegen_limits(spark, sf_dir):
    """nlist=256 at dim=64 (16k centroid components) — far past where
    the old literal-embedded centroid expression hit janino's generated-
    method limits. Closure-shipped GEMM assignment must build and query
    fine, and auto-sizing (k=None) must pick ~sqrt(n) lists."""
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = similarity.ivf_build(emb, k=256, iters=1)
    assert len(centroids) == 256
    queries = emb.filter(F.col("vec_id") < 3)
    out = similarity.ivf_topk(queries, emb, centroids, k=5, nprobe=8)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    assert all(1 <= r["rank"] <= 5 for r in rows)

    auto = similarity.ivf_build(emb, k=None, iters=1)
    import math

    n = emb.count()
    assert len(auto) == max(8, min(4096, int(round(math.sqrt(n)))))


def test_ivf_build_wide_dim_and_nlist_in_seconds(spark):
    """dim=1024 x nlist=256: the former per-dimension
    sum(element_at(v, i)) centroid update generated 1024 codegen sum
    columns (minutes of janino at this width); the numpy partial-sum
    kernel must build promptly and deterministically at any (k, dim)
    (round-2 VERDICT #6)."""
    import time

    import numpy as np

    rng = np.random.default_rng(7)
    dim, n, k = 1024, 1024, 256
    data = [(i, rng.standard_normal(dim).tolist()) for i in range(n)]
    df = spark.createDataFrame(data, ["vec_id", "embedding"]).repartition(8)
    t0 = time.perf_counter()
    centroids = similarity.ivf_build(df, k=k, iters=2)
    elapsed = time.perf_counter() - t0
    assert len(centroids) == k and len(centroids[0]) == dim
    assert elapsed < 60, f"wide ivf_build took {elapsed:.1f}s"
    again = similarity.ivf_build(df, k=k, iters=2)
    assert centroids == again


# ---------------------------------------------------------------------------
# Round 4: repetition metrics, decontamination, quota sampling
# ---------------------------------------------------------------------------


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_word_ngrams_short_doc_guard(spark):
    """sequence(1, 0) yields [1, 0] in Spark — a doc shorter than n must
    still produce an EMPTY gram array, not a phantom gram."""
    df = _docs_df(spark, ["one two", "one", "", "a b c"])
    out = df.select(
        F.col("doc_id"), text.word_ngrams_expr("text", 3).alias("g")
    ).collect()
    by_id = {r.doc_id: r.g for r in out}
    assert by_id[0] == []
    assert by_id[1] == []
    assert by_id[2] == []
    assert by_id[3] == ["a b c"]


def test_repetition_metrics_known_values(spark):
    df = _docs_df(
        spark,
        [
            "a b a b a",  # 5 tokens, 2 distinct; bigram tie a-b/b-a -> 'a b'
            "x",  # single word: no bigram
            "",  # empty: no tokens at all
            "q q q q",  # all same: dup 3/4, top bigram 'q q' 3/3
        ],
    )
    rows = {r.doc_id: r for r in text.repetition_metrics(df).collect()}
    r0 = rows[0]
    assert r0.n_tokens == 5
    assert abs(r0.dup_word_frac - 0.6) < 1e-9
    assert r0.top_bigram == "a b"  # tie with 'b a' breaks lexicographically
    assert abs(r0.top_bigram_frac - 0.5) < 1e-9
    r1 = rows[1]
    assert r1.n_tokens == 1 and r1.top_bigram is None and r1.top_bigram_frac == 0.0
    r2 = rows[2]
    assert r2.n_tokens == 0 and r2.dup_word_frac == 0.0 and r2.top_bigram is None
    r3 = rows[3]
    assert r3.n_tokens == 4
    assert abs(r3.dup_word_frac - 0.75) < 1e-9
    assert r3.top_bigram == "q q" and abs(r3.top_bigram_frac - 1.0) < 1e-9


def test_decontaminate_flags_exact_overlap_only(spark):
    bench = _docs_df(spark, ["one two three four five six"])
    train = spark.createDataFrame(
        [
            (10, "zzz one two three four five end"),  # shares a 5-gram
            (11, "alpha beta gamma delta epsilon zeta"),  # disjoint vocab
            (12, "too short"),  # < 5 words: zero grams
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in text.decontaminate(train, bench, n=5).collect()}
    assert rows[10].contaminated and rows[10].n_hits == 1
    assert not rows[11].contaminated and rows[11].n_hits == 0
    assert rows[11].n_grams == 2
    assert rows[12].n_grams == 0 and rows[12].n_hits == 0
    assert not rows[12].contaminated


def test_quota_sample_caps_every_group(spark, sf_dir):
    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        quota_sample,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    quota = 3
    out = quota_sample(docs, ("lang", "source"), quota=quota, key_col="doc_id")
    sizes = {
        (r.lang, r.source): r.n
        for r in out.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    orig = {
        (r.lang, r.source): r.n
        for r in docs.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    assert sizes, "no groups sampled"
    for grp, n in sizes.items():
        assert n == min(quota, orig[grp]), (grp, n, orig[grp])
    # content-addressed: identical selection on re-run
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in quota_sample(
            docs, ("lang", "source"), quota=quota, key_col="doc_id"
        ).collect()
    )
    assert a == b


def test_quota_sample_skew_safe_equals_plain(spark, sf_dir):
    """The two-stage skew-proof variant must select the IDENTICAL rows
    and ranks as the one-stage window, regardless of input layout."""
    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        quota_sample,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    plain = quota_sample(docs, ("lang",), quota=5, key_col="doc_id")
    key = lambda r: (r.lang, r.sample_rank, r.doc_id)  # noqa: E731
    expected = sorted(
        (r.lang, r.sample_rank, r.doc_id) for r in plain.collect()
    )
    for parts in (1, 8, 32):
        safe = quota_sample(
            docs.repartition(parts), ("lang",), quota=5, key_col="doc_id",
            skew_safe=True,
        )
        got = sorted((r.lang, r.sample_rank, r.doc_id) for r in safe.collect())
        assert got == expected, f"parts={parts}"


def test_quantize_embeddings_error_bound_and_cosine(spark, sf_dir):
    """int8 quantization must honor the worst-case reconstruction bound
    |x - q*scale| <= scale/2 on every element, preserve cosine to
    ~1e-3 on real embeddings, and handle zero vectors exactly."""
    import math

    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    orig = {r.vec_id: r.embedding for r in emb.collect()}
    q = quantize_embeddings(emb)
    qrows = {r.vec_id: r for r in q.collect()}
    deq = {r.vec_id: r.embedding for r in dequantize_embeddings(q).collect()}
    assert set(deq) == set(orig)
    for vid, x in orig.items():
        qr = qrows[vid]
        assert all(-127 <= e <= 127 for e in qr.qvec)
        for a, b in zip(x, deq[vid]):
            assert abs(a - b) <= qr.q_scale / 2 + 1e-6
        dot = sum(a * b for a, b in zip(x, deq[vid]))
        na = math.sqrt(sum(a * a for a in x))
        nb = math.sqrt(sum(b * b for b in deq[vid]))
        if na > 0 and nb > 0:
            assert dot / (na * nb) > 0.999

    zero = spark.createDataFrame([(1, [0.0] * 8)], ["vec_id", "embedding"])
    zr = quantize_embeddings(zero).collect()[0]
    assert zr.q_scale == 0.0 and all(e == 0 for e in zr.qvec)


def test_assemble_batches_deterministic_concat(spark, sf_dir):
    """Batch text must equal the chunks concatenated in pack order —
    independent of partition layout (collect_list arrival order)."""
    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        assemble_batches,
        chunk_documents,
        pack_batches,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    chunks = chunk_documents(docs, chunk_chars=128, overlap=16).withColumn(
        "n_tokens", F.length("chunk_text")
    )
    packed = pack_batches(chunks, "n_tokens", budget=1000)
    rows = sorted(
        packed.select("doc_id", "chunk_idx", "chunk_text", "batch_id").collect(),
        key=lambda r: (r.doc_id, r.chunk_idx),
    )
    expect = {}
    for r in rows:
        b = expect.setdefault(r.batch_id, {"text": [], "n": 0, "tok": 0})
        b["text"].append(r.chunk_text)
        b["n"] += 1
        b["tok"] += len(r.chunk_text)

    for parts in (1, 16):
        out = {
            r.batch_id: r
            for r in assemble_batches(packed.repartition(parts)).collect()
        }
        assert set(out) == set(expect)
        for bid, e in expect.items():
            r = out[bid]
            assert r.batch_text == "".join(e["text"]), bid
            assert r.n_chunks == e["n"] and r.sum_tokens == e["tok"]


def test_topk_over_quantized_embeddings_preserves_neighbors(spark, sf_dir):
    """The int8 serving path end-to-end: quantize the embedding table,
    dequantize, and run top-k — the neighbor sets must match the
    float-precision baseline almost exactly (quantization noise is
    ~q_scale/2 per element, far below typical neighbor margins)."""
    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        brute_force_topk,
        dequantize_embeddings,
        quantize_embeddings,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    deq = dequantize_embeddings(quantize_embeddings(emb))
    base = {
        (r.query_id, r.match_id)
        for r in brute_force_topk(queries, emb, k=10).collect()
    }
    quant = {
        (r.query_id, r.match_id)
        for r in brute_force_topk(queries, deq, k=10).collect()
    }
    overlap = len(base & quant) / len(base)
    assert overlap >= 0.9, overlap


def test_ivf_sq8_topk_recall_scores_and_serving_parity(spark, sf_dir):
    """Round-11 quantized ANN path (ivf_sq8_topk):

    - recall@10 >= 0.8 vs brute force AND >= the unquantized ivf_topk
      recall on the same centroids minus 0.05 (quantization may cost
      shortlist recall, not collapse it);
    - every returned score is the EXACT cosine of that pair (re-rank on
      full vectors — quantization never reaches the output scores);
    - the precomputed-serving path returns the identical result set as
      the inline build (the deployment artifact is semantics-free);
    - m_rerank < k raises (can't return k rows from a shorter
      shortlist), and m_rerank=k still meets the recall floor here.
    """
    import pytest as _pytest

    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        brute_force_topk,
        ivf_build,
        ivf_sq8_serving_table,
        ivf_sq8_topk,
        ivf_topk,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cents = ivf_build(emb, k=8, iters=3)
    got_rows = ivf_sq8_topk(queries, emb, cents, k=10, nprobe=4).collect()
    got = {(r.query_id, r.match_id) for r in got_rows}
    brute = {
        (r.query_id, r.match_id)
        for r in brute_force_topk(queries, emb, k=10).collect()
    }
    ivf = {
        (r.query_id, r.match_id)
        for r in ivf_topk(queries, emb, cents, k=10, nprobe=4).collect()
    }
    recall = len(got & brute) / len(brute)
    recall_ivf = len(ivf & brute) / len(brute)
    assert recall >= max(0.8, recall_ivf - 0.05), (recall, recall_ivf)

    exact = {
        (r.query_id, r.match_id): r.score
        for r in brute_force_topk(queries, emb, k=emb.count()).collect()
    }
    for r in got_rows:
        assert abs(exact[(r.query_id, r.match_id)] - r.score) <= 1e-9, r

    serving = ivf_sq8_serving_table(emb, cents)
    via_serving = {
        (r.query_id, r.match_id, r.rank)
        for r in ivf_sq8_topk(
            queries, emb, cents, k=10, nprobe=4, serving=serving
        ).collect()
    }
    assert via_serving == {(r.query_id, r.match_id, r.rank) for r in got_rows}

    with _pytest.raises(ValueError, match="m_rerank"):
        ivf_sq8_topk(queries, emb, cents, k=10, m_rerank=5)
    tight = {
        (r.query_id, r.match_id)
        for r in ivf_sq8_topk(
            queries, emb, cents, k=10, nprobe=4, m_rerank=10
        ).collect()
    }
    assert len(tight & brute) / len(brute) >= 0.8


def test_ivf_pq_topk_recall_scores_and_guards(spark, sf_dir):
    """Round-11 product-quantization tier (pq_build/pq_encode/
    ivf_pq_topk): recall@10 >= 0.7 vs brute force at m_rerank=100 (the
    corpus-entry config; PQ trades recall for 8-byte codes), every
    returned score is the exact cosine, the precomputed-serving path
    returns the identical result, codes are m bytes long in [0, ksub),
    and the guards raise: m_rerank < k, dim not divisible by m,
    ksub > 127 (codes are TINYINT)."""
    import pytest as _pytest

    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        brute_force_topk,
        ivf_build,
        ivf_pq_topk,
        pq_build,
        pq_encode,
        pq_serving_table,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cents = ivf_build(emb, k=8, iters=3)
    books = pq_build(emb, m=8, ksub=16, iters=2)
    got_rows = ivf_pq_topk(
        queries, emb, cents, books, k=10, nprobe=4, m_rerank=100
    ).collect()
    got = {(r.query_id, r.match_id) for r in got_rows}
    brute = {
        (r.query_id, r.match_id)
        for r in brute_force_topk(queries, emb, k=10).collect()
    }
    assert len(got & brute) / len(brute) >= 0.7

    exact = {
        (r.query_id, r.match_id): r.score
        for r in brute_force_topk(queries, emb, k=emb.count()).collect()
    }
    for r in got_rows:
        assert abs(exact[(r.query_id, r.match_id)] - r.score) <= 1e-9, r

    serving = pq_serving_table(emb, cents, books)
    via_serving = {
        (r.query_id, r.match_id, r.rank)
        for r in ivf_pq_topk(
            queries, emb, cents, books, k=10, nprobe=4, m_rerank=100,
            serving=serving,
        ).collect()
    }
    assert via_serving == {(r.query_id, r.match_id, r.rank) for r in got_rows}

    codes = pq_encode(emb, books).collect()
    assert all(
        len(r.codes) == 8 and all(0 <= c < 16 for c in r.codes) for r in codes
    )

    with _pytest.raises(ValueError, match="m_rerank"):
        ivf_pq_topk(queries, emb, cents, books, k=10, m_rerank=5)
    with _pytest.raises(ValueError, match="divisible"):
        pq_build(emb, m=7)
    with _pytest.raises(ValueError, match="TINYINT"):
        pq_build(emb, m=8, ksub=128)
    with _pytest.raises(ValueError, match="TINYINT"):
        pq_encode(emb, [[[0.0] * 8] * 128] * 8)
    with _pytest.raises(ValueError, match="empty"):
        pq_build(emb.filter(F.col("vec_id") < 0))


def test_pq_build_fused_equals_per_subspace_ivf_build(spark, sf_dir):
    """The fused one-kernel-per-iteration pq_build (round-11 review:
    the first cut ran m separate ivf_builds, ~m*(iters+1) corpus
    scans) must be numerically IDENTICAL to the per-subspace reference
    — same rows, same partition layout, same pid-sorted reduce order,
    so every centroid matches bit-for-bit, not approximately."""
    from accounts_receivable_data_pipeline_api_spark.operators.similarity import (
        _as_double,
        ivf_build,
        pq_build,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    m, ksub, iters = 4, 8, 2
    fused = pq_build(emb, m=m, ksub=ksub, iters=iters)
    d = len(fused[0][0])  # subspace width, derived — not a constant
    for s in range(m):
        sub = emb.select(
            F.col("vec_id"),
            F.slice(_as_double(F.col("embedding")), s * d + 1, d).alias("__sv"),
        )
        ref = ivf_build(sub, k=ksub, iters=iters, vec_col="__sv")
        assert fused[s] == ref, f"subspace {s} diverged"


# ---------------------------------------------------------------------------
# Round-5 operators: LM scoring, bloom decontamination, mixture/shards,
# incremental dedup, semantic dedup
# ---------------------------------------------------------------------------


def test_ngram_lm_score_known_values(spark):
    train = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"]
    )
    score = spark.createDataFrame(
        [(10, "a b"), (11, "z z"), (12, "solo")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in text.ngram_lm_score(train, score, k=0.5).collect()}
    # train bigrams: "a b a b" -> (a,b),(b,a),(a,b); "a b c" -> (a,b),(b,c)
    # so cnt(a->b)=3, cnt(ctx a)=3; vocab {a,b,c} -> V=4.
    # P(b|a) = (3 + .5) / (3 + .5*4) = 0.7 -> ln = -0.356675
    import math

    assert rows[10].n_bigrams == 1
    assert abs(rows[10].sum_logprob - round(math.log(0.7), 6)) < 1e-9
    assert rows[10].nll_per_token == -round(math.log(0.7), 6) / 1
    # unseen context z: P = k / (0 + k*V) = 1/V = 0.25
    assert abs(rows[11].sum_logprob - round(math.log(0.25), 6)) < 1e-9
    # single-word doc: zero bigrams, NULL nll, zero sum
    assert rows[12].n_bigrams == 0
    assert rows[12].sum_logprob == 0.0
    assert rows[12].nll_per_token is None


def test_ngram_lm_score_orders_quality(spark):
    """A doc made of training-frequent bigrams must score lower NLL
    than vocabulary soup."""
    train = spark.createDataFrame(
        [(i, "the cat sat on the mat and the dog sat on the rug") for i in range(5)],
        ["doc_id", "text"],
    )
    score = spark.createDataFrame(
        [(100, "the cat sat on the rug"), (101, "qqq www eee rrr ttt yyy")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in text.ngram_lm_score(train, score).collect()}
    assert rows[100].nll_per_token < rows[101].nll_per_token


def test_bloom_no_false_negatives_and_fp_bound(spark):
    bench = spark.createDataFrame(
        [(i, f"marker{i} alpha beta gamma delta epsilon{i}") for i in range(20)],
        ["doc_id", "text"],
    )
    train_rows = [(100 + i, f"zz{i} yy{i} xx{i} ww{i} vv{i} uu{i}") for i in range(50)]
    train_rows += [(200, "marker3 alpha beta gamma delta epsilon3 tail words here")]
    train = spark.createDataFrame(train_rows, ["doc_id", "text"])
    bitmap = text.bloom_build(bench, n=5, m_bits=1 << 17, n_hashes=3)
    bloom = {
        r.doc_id: r
        for r in text.decontaminate_bloom(
            train, bitmap, n=5, m_bits=1 << 17, n_hashes=3
        ).collect()
    }
    exact = {r.doc_id: r for r in text.decontaminate(train, bench, n=5).collect()}
    # no false negatives: every exact hit is a bloom hit, per doc
    for did, ex in exact.items():
        assert bloom[did].n_hits_bloom >= ex.n_hits, did
        assert bloom[did].n_grams == ex.n_grams, did
        if ex.contaminated:
            assert bloom[did].flagged, did
    assert bloom[200].flagged
    # fp bound: with ~100 benchmark grams in 2^17 bits the fp rate is
    # ~(3*100/131072)^3 ~ 1e-8; 300 clean grams should all read clean
    false_pos = sum(
        bloom[did].n_hits_bloom - ex.n_hits for did, ex in exact.items()
    )
    assert false_pos == 0


def test_mixture_sample_quota_math(spark):
    # groups: a=90, b=10 docs. alpha=0.5 -> weights 3:1 of sqrt(90)~9.487, sqrt(10)~3.162
    rows = [(i, "a") for i in range(90)] + [(100 + i, "b") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        mixture_sample,
        shard_order,
    )

    out = mixture_sample(df, "source", total=40, key_col="doc_id").collect()
    per = {}
    for r in out:
        per[r.source] = per.get(r.source, 0) + 1
    assert sum(per.values()) == 40
    # w_a = 9.4868/(9.4868+3.1623) = 0.75 -> 30; w_b -> 10
    assert per["a"] == 30 and per["b"] == 10
    # alpha upsamples small groups vs proportional (which would be 36/4)
    assert per["b"] > 4
    # determinism across repartitionings
    out2 = mixture_sample(df.repartition(7), "source", total=40, key_col="doc_id").collect()
    assert sorted(r.doc_id for r in out2) == sorted(r.doc_id for r in out)
    # group smaller than quota contributes all rows, result < total
    tiny = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], ["doc_id", "source"]
    )
    got = mixture_sample(tiny, "source", total=10, key_col="doc_id").count()
    assert got == 3


def test_shard_order_is_stable_total_order(spark):
    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        shard_order,
    )

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    out = shard_order(df, "doc_id", n_shards=8, seed="s1").collect()
    assert len(out) == 500
    # positions are 1..count(shard) dense within each shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    assert len(by_shard) == 8
    # same seed reproducible regardless of partitioning; different seed permutes
    out2 = shard_order(df.repartition(13), "doc_id", n_shards=8, seed="s1").collect()
    assert {(r.doc_id, r.shard, r.shard_pos) for r in out2} == {
        (r.doc_id, r.shard, r.shard_pos) for r in out
    }
    out3 = shard_order(df, "doc_id", n_shards=8, seed="s2").collect()
    assert {(r.doc_id, r.shard) for r in out3} != {(r.doc_id, r.shard) for r in out}


def test_incremental_exact_statuses(spark):
    old = spark.createDataFrame(
        [(1, "existing corpus document one"), (2, "existing corpus document two")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            (10, "EXISTING  corpus document one"),  # dup of old after norm
            (11, "fresh delta content a"),
            (12, "fresh delta content a"),  # dup within delta, higher id
            (13, "fresh delta content b"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r.status for r in dedup.incremental_exact(new, old).collect()}
    assert rows == {
        10: "dup_of_old",
        11: "kept",
        12: "dup_in_new",
        13: "kept",
    }


def test_incremental_jaccard_equals_full_minus_old_old(spark, sf_dir):
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    new = docs.filter(F.col("doc_id") % 3 != 0)
    old = docs.filter(F.col("doc_id") % 3 == 0)
    inc = dedup.ngram_jaccard_pairs_incremental(new, old, threshold=0.2).collect()
    full = dedup.ngram_jaccard_pairs(docs, threshold=0.2).collect()
    want = {
        (r.id_a, r.id_b): r.jaccard
        for r in full
        if not (r.id_a % 3 == 0 and r.id_b % 3 == 0)
    }
    got = {}
    for r in inc:
        key = (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        got[key] = r.jaccard
        # orientation: old endpoint first on cross pairs
        if r.is_cross:
            assert r.id_a % 3 == 0 and r.id_b % 3 != 0
        else:
            assert r.id_a % 3 != 0 and r.id_b % 3 != 0 and r.id_a < r.id_b
    assert got == want  # bit-identical jaccard on the identical pair set


def test_semantic_prune_kept_set_is_dissimilar(spark, sf_dir):
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    seeds = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("seed_id"), F.col("embedding").alias("seed_vec")
    )
    assign = dedup.assign_nearest_seed(emb, seeds)
    out = dedup.semantic_prune(
        emb, assign.select("vec_id", "cluster_id"), threshold=0.3
    )
    rows = out.collect()
    assert len(rows) == emb.count()
    pruned = {r.vec_id for r in rows if r.pruned}
    kept = {r.vec_id: r.cluster_id for r in rows if not r.pruned}
    # every pruned vector has a lower-id in-cluster neighbor >= threshold;
    # kept vectors have NO lower-id kept neighbor >= threshold in-cluster
    exact = dedup.embedding_cosine_pairs(emb, threshold=0.3).collect()
    sim = {(r.id_a, r.id_b) for r in exact}
    cluster = {r.vec_id: r.cluster_id for r in rows}
    for a, b in sim:
        if cluster[a] == cluster[b]:
            assert b in pruned, (a, b)  # higher id of an in-cluster pair never kept
    # seeds exist in assignment and clusters are seed ids
    assert set(cluster.values()) <= set(range(16))


def test_semantic_prune_accepts_kmeans_assignment(spark, sf_dir):
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    cents = similarity.ivf_build(emb, k=8, iters=2)
    assign = similarity.assign_clusters(
        emb.select("vec_id", "embedding"), cents, "embedding"
    ).select("vec_id", F.col("cluster").alias("cluster_id"))
    out = dedup.semantic_prune(emb, assign, threshold=0.3)
    rows = out.collect()
    assert len(rows) == 200
    # structural: pruned set only contains vectors with an in-cluster
    # lower-id neighbor at >= threshold (soundness on the kmeans path)
    exact = {(r.id_a, r.id_b) for r in dedup.embedding_cosine_pairs(
        emb, threshold=0.3
    ).collect()}
    cl = {r.vec_id: r.cluster_id for r in rows}
    for r in rows:
        if r.pruned:
            assert any(
                (a, r.vec_id) in exact and cl[a] == cl[r.vec_id]
                for a in range(r.vec_id)
            ), r.vec_id


def test_mixture_sample_alpha_extremes(spark):
    """alpha=1 is proportional allocation; alpha=0 splits evenly across
    groups (temperature extremes of the mixture dial, via the pow()
    path rather than the oracle-pinned sqrt)."""
    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        mixture_sample,
    )

    rows = [(i, "a") for i in range(80)] + [(100 + i, "b") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    per = {}
    for r in mixture_sample(df, "source", total=50, key_col="doc_id", alpha=1.0).collect():
        per[r.source] = per.get(r.source, 0) + 1
    assert per == {"a": 40, "b": 10}
    per0 = {}
    for r in mixture_sample(df, "source", total=50, key_col="doc_id", alpha=0.0).collect():
        per0[r.source] = per0.get(r.source, 0) + 1
    # even split targets 25/25, but group b only has 20 rows — it
    # contributes all of them and the result lands under total
    assert per0 == {"a": 25, "b": 20}


def test_bpe_train_known_merges(spark):
    """On a corpus where 'ab' dominates, the first merges build it."""
    from accounts_receivable_data_pipeline_api_spark.operators.tokenize import (
        EOW,
        bpe_train,
    )

    df = spark.createDataFrame(
        [(i, "abab abab cd") for i in range(10)], ["doc_id", "text"]
    )
    merges = bpe_train(df, num_merges=5)
    assert merges[0] == ("a", "b")  # most frequent pair
    # composition: within 3 merges the whole word 'abab' becomes ONE
    # token (tie at count 20 resolves lexicographically: (ab,</w>)
    # precedes (ab,ab), then (ab, ab</w>) completes the word)
    from accounts_receivable_data_pipeline_api_spark.operators.tokenize import (
        _encode_word,
    )

    ranks = {pair: i for i, pair in enumerate(merges)}
    assert _encode_word("abab", ranks) == ["abab" + EOW]


def test_bpe_roundtrip_and_determinism(spark, sf_dir):
    """Detokenization reconstructs the normalized text of EVERY doc;
    token streams are identical across partition layouts."""
    from accounts_receivable_data_pipeline_api_spark.operators.tokenize import (
        EOW,
        bpe_apply,
        bpe_train,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, num_merges=100)
    assert len(merges) > 10
    out = bpe_apply(docs, merges).select("doc_id", "text", "bpe_tokens").collect()
    import re as _re

    for r in out:
        norm = _re.sub(r"\s+", " ", r.text.lower()).strip()
        detok = "".join(r.bpe_tokens).replace(EOW, " ").rstrip()
        assert detok == norm, r.doc_id
    again = {
        r.doc_id: tuple(r.bpe_tokens)
        for r in bpe_apply(docs.repartition(7), merges).select(
            "doc_id", "bpe_tokens"
        ).collect()
    }
    first = {r.doc_id: tuple(r.bpe_tokens) for r in out}
    assert again == first
    # retrain reproducibility: identical merge table from identical bytes
    assert bpe_train(docs, num_merges=100) == merges


def test_bpe_compresses_relative_to_chars(spark, sf_dir):
    """More merges => fewer tokens, bounded below by word count."""
    from accounts_receivable_data_pipeline_api_spark.operators.tokenize import (
        bpe_apply,
        bpe_train,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table
    from accounts_receivable_data_pipeline_api_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    m50 = bpe_train(docs, num_merges=50)
    m200 = bpe_train(docs, num_merges=200)
    t50 = bpe_apply(docs, m50).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    t200 = bpe_apply(docs, m200).agg(F.sum("n_bpe_tokens")).collect()[0][0]
    n_words = docs.select(F.sum(token_count("text"))).collect()[0][0]
    n_chars = docs.select(F.sum(F.length("text"))).collect()[0][0]
    assert t200 < t50 < n_chars  # merges compress below character count
    assert t200 >= n_words  # a word never tokenizes below 1 token


def test_semantic_prune_occupancy_cap_is_sound_subset(spark, sf_dir):
    """max_cluster_rows: capped pruned set is a subset of the uncapped
    one (sub-cell boundaries only ever ACCEPT misses, never invent
    prunes), every cell stays under the cap's quadratic, and the result
    is layout-invariant."""
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    seeds = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("seed_id"), F.col("embedding").alias("seed_vec")
    )
    assign = dedup.assign_nearest_seed(emb, seeds).select("vec_id", "cluster_id")
    free = {r.vec_id for r in dedup.semantic_prune(emb, assign, 0.3).collect() if r.pruned}
    capped_rows = dedup.semantic_prune(
        emb, assign, 0.3, max_cluster_rows=20
    ).collect()
    capped = {r.vec_id for r in capped_rows if r.pruned}
    assert capped <= free
    assert len(capped_rows) == emb.count()  # every vector still classified
    again = {
        r.vec_id
        for r in dedup.semantic_prune(
            emb.repartition(7), assign, 0.3, max_cluster_rows=20
        ).collect()
        if r.pruned
    }
    assert again == capped


def test_lsh_topk_sizing_respects_probe_budget():
    """A capped probe budget shrinks the per-table radius-1 ball, so
    the analytic P_1 must shrink (fixed-subset bound) and the inverted
    table count must GROW — the sizing can no longer assume flips it
    will never probe (round-5 review finding)."""
    import math

    full = similarity.expected_lsh_topk_recall(9, 1, 0.5, 1)
    capped = similarity.expected_lsh_topk_recall(9, 1, 0.5, 1, num_probes=2)
    assert capped < full
    p = 1.0 - math.acos(0.5) / math.pi
    assert capped == pytest.approx(p**9 + 2 * p**8 * (1 - p))

    def tables_needed(p1, target=0.67):
        return math.ceil(math.log(1 - target) / math.log(1 - p1))

    assert tables_needed(capped) > tables_needed(full)


def test_cms_one_sided_and_additive(spark, sf_dir):
    """CMS contract on real corpus tokens: estimate >= exact for every
    queried token (one-sided, always), within eps*N at the default
    sizing, and sketches merge EXACTLY (cms(A)+cms(B) == cms(A++B))."""
    import numpy as np

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        cms_build,
        cms_merge,
        cms_query,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    exact = {
        r.token: r.c
        for r in tokens.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc())
        .limit(20)
        .collect()
    }
    n_total = tokens.count()
    sk = cms_build(tokens, "token")
    est = cms_query(sk, list(exact))
    eps = 2.718281828 / 2048
    for tok, true_c in exact.items():
        assert est[tok] >= true_c, tok  # never undercounts
        assert est[tok] <= true_c + eps * n_total * 4, tok  # loose 4x slack
    assert int(sk.sum()) == n_total * 4  # every item hits every row once

    a = cms_build(tokens.filter(F.md5("token").startswith("a")), "token")
    b = cms_build(tokens.filter(~F.md5("token").startswith("a")), "token")
    assert np.array_equal(cms_merge(a, b), sk)  # exact additivity


def test_cms_layout_invariant(spark, sf_dir):
    import numpy as np

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import cms_build
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    assert np.array_equal(
        cms_build(tokens, "token"), cms_build(tokens.repartition(7), "token")
    )


def test_remove_boilerplate_lines(spark):
    header = "COOKIE BANNER: accept all cookies"
    footer = "(c) 2024 Example Corp - all rights reserved"
    rows = [
        (1, f"{header}\nunique content one\n{footer}"),
        (2, f"{header}\nsome other words\nmore words here\n{footer}"),
        (3, f"{header.lower()}\nthird doc body\n{footer.upper()}"),  # cosmetic variants
        (4, f"{header}\n{footer}"),  # pure boilerplate
        (5, "completely standalone document"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in text.remove_boilerplate_lines(df, min_df=3).collect()}
    assert out[1].cleaned_text == "unique content one"
    assert out[2].cleaned_text == "some other words\nmore words here"  # order kept
    assert out[3].cleaned_text == "third doc body"
    assert out[4].cleaned_text == "" and out[4].n_removed == 2
    assert out[5].cleaned_text == "completely standalone document"
    assert out[5].n_removed == 0
    assert out[2].n_lines == 4 and out[2].n_removed == 2
    # idempotence: a second pass removes nothing further
    cleaned = spark.createDataFrame(
        [(k, v.cleaned_text) for k, v in out.items()], ["doc_id", "text"]
    )
    out2 = {
        r.doc_id: r
        for r in text.remove_boilerplate_lines(cleaned, min_df=3).collect()
    }
    for k in out:
        assert out2[k].cleaned_text == out[k].cleaned_text
        assert out2[k].n_removed == 0
    # layout invariance
    outr = {
        r.doc_id: r.cleaned_text
        for r in text.remove_boilerplate_lines(df.repartition(5), min_df=3).collect()
    }
    assert outr == {k: v.cleaned_text for k, v in out.items()}


def _mk_bmp(px) -> bytes:
    """Minimal 24-bit bottom-up BMP from an (h, w, 3) uint8 array."""
    import struct

    import numpy as np

    h, w, _ = px.shape
    row_size = (3 * w + 3) // 4 * 4
    pad = b"\x00" * (row_size - 3 * w)
    body = b"".join(px[j].tobytes() + pad for j in range(h - 1, -1, -1))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + info + body


def test_dhash_brightness_invariant_and_near_pairs(spark):
    import numpy as np

    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        dhash_images,
        image_near_dup_pairs,
    )

    rng = np.random.default_rng  # noqa: F841 — no RNG: gradients are deterministic
    base = np.zeros((32, 48, 3), dtype=np.uint8)
    for j in range(48):
        base[:, j, :] = 4 * j  # horizontal gradient
    brighter = np.clip(base.astype(np.int32) + 40, 0, 255).astype(np.uint8)
    perturbed = base.copy()
    perturbed[0:4, 0:6, :] = 255  # one corner cell flipped hard
    inverse = base[:, ::-1, :].copy()  # reversed gradient: far

    rows = [
        (1, bytes(_mk_bmp(base))),
        (2, bytes(_mk_bmp(brighter))),
        (3, bytes(_mk_bmp(perturbed))),
        (4, bytes(_mk_bmp(inverse))),
        (5, b"not an image"),
    ]
    media = spark.createDataFrame(rows, "doc_id long, content binary")
    hashes = {r.doc_id: r for r in dhash_images(media).collect()}
    assert hashes[1].width == 48 and hashes[1].height == 32
    # uniform brightness shift preserves every gradient comparison
    assert hashes[2].dhash == hashes[1].dhash
    # local perturbation: nearby, not identical
    d13 = bin((hashes[1].dhash ^ hashes[3].dhash) & (2**64 - 1)).count("1")
    assert 1 <= d13 <= 10
    # reversed gradient flips (almost) every comparison: far
    d14 = bin((hashes[1].dhash ^ hashes[4].dhash) & (2**64 - 1)).count("1")
    assert d14 > 32
    assert hashes[5].dhash is None  # quarantined, not failed

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dup_pairs(media, max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] == d13
    assert (1, 4) not in pairs


def test_dhash_on_synthesized_corpus_images(spark, sf_dir):
    """End-to-end over the real synthesize->decode path: every
    synthesized BMP and PNG hashes (no NULLs), and exact payload
    duplicates collide exactly."""
    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        attach_binary,
        dhash_images,
        synthesize_bmp,
        synthesize_png,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    for synth in (synthesize_bmp, synthesize_png):
        media = synth(docs)
        out = dhash_images(media).collect()
        assert len(out) == 60
        assert all(r.dhash is not None for r in out)


def test_compression_ratio_separates_repetition_from_entropy(spark):
    import hashlib

    # deterministic "high-entropy" soup: chained sha256 hex
    h, soup = b"seed", []
    for _ in range(50):
        h = hashlib.sha256(h).digest()
        soup.append(h.hex())
    prose = (
        "The quarterly report outlines revenue growth across several "
        "distinct market segments, with notable regional variation. "
        "Management attributes the shift to changed customer behavior, "
        "while analysts point instead at pricing and channel mix. "
    ) * 8  # long enough that the zlib header is negligible
    rows = [
        (1, "spam spam spam " * 200),  # hyper-repetitive: compresses hard
        (2, prose),
        (3, "".join(soup)),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in text.compression_ratio(df).collect()}
    assert out[1].compression_ratio < 0.05
    # repeated prose still compresses (repetition + English structure)
    assert out[1].compression_ratio < out[2].compression_ratio < out[3].compression_ratio
    assert out[3].compression_ratio > 0.4  # hex soup barely compresses
    assert out[4].compression_ratio is None and out[4].n_bytes == 0
    # deterministic across layouts
    again = {
        r.doc_id: r.n_compressed
        for r in text.compression_ratio(df.repartition(3)).collect()
    }
    assert again == {k: v.n_compressed for k, v in out.items()}


def test_wav_roundtrip_and_features(spark, sf_dir):
    """Real audio path end-to-end: synthesized PCM WAVs parse back with
    the synthesis contract's exact parameters, features are
    independently recomputable from the md5-digest sample stream, and
    garbage payloads quarantine to NULLs."""
    import hashlib

    import numpy as np

    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        _wav_params_from_text,
        decode_audio_features,
        synthesize_wav,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    media = synthesize_wav(docs)
    feats = {r.doc_id: r for r in decode_audio_features(media).collect()}
    assert len(feats) == 40
    for r in docs.collect():
        seed, rate, n = _wav_params_from_text(r.text)
        f = feats[r.doc_id]
        assert (f.sample_rate, f.n_samples) == (rate, n), r.doc_id
        assert f.duration_ms == n * 1000 // rate
        # independent recompute from the synthesis contract
        digest = bytes.fromhex(seed)
        pcm = (digest * ((n * 2 + len(digest) - 1) // len(digest)))[: n * 2]
        x = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
        assert f.rms == round(float(np.sqrt(np.mean(x * x))), 6)
        assert f.peak == int(np.max(np.abs(x)))
        assert f.sample_checksum == hashlib.md5(pcm.hex().encode()).hexdigest()
        # Goertzel integer-bin energies: brute-force single-bin DFT
        # (float trig) must agree with the strided integer formulation
        # to within float tolerance, and the DC/Nyquist bins exactly
        xi = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
        assert f.band_dc_energy == int(xi.sum()) ** 2
        nyq = int(xi[0::2].sum() - xi[1::2].sum())
        assert f.band_high_energy == nyq * nyq
        idx = np.arange(n)
        ref_mid = (
            float(np.sum(x * np.cos(np.pi * idx / 2))) ** 2
            + float(np.sum(x * np.sin(np.pi * idx / 2))) ** 2
        )
        assert abs(f.band_mid_energy - ref_mid) <= max(1e-6 * ref_mid, 1e-3)

    junk = spark.createDataFrame(
        [(900, b"RIFFxxxxWAVEnot really"), (901, b"plainly not audio")],
        "doc_id long, content binary",
    )
    bad = {r.doc_id: r for r in decode_audio_features(junk).collect()}
    assert bad[900].sample_rate is None and bad[901].rms is None
    assert bad[900].band_dc_energy is None and bad[901].band_mid_energy is None


def test_wav_parser_rejects_non_pcm_and_odd_chunks():
    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        _wav_bytes,
        _wav_samples,
    )

    good = _wav_bytes("ab" * 16, 16000, 64)
    rate, n, pcm = _wav_samples(good)
    assert (rate, n) == (16000, 64) and len(pcm) == 128
    # flip audio format to 3 (IEEE float): rejected
    bad = bytearray(good)
    bad[20] = 3
    assert _wav_samples(bytes(bad)) is None
    # stereo: rejected
    bad = bytearray(good)
    bad[22] = 2
    assert _wav_samples(bytes(bad)) is None
    # truncated data chunk: rejected
    assert _wav_samples(good[:-10]) is None


def test_avi_roundtrip_frame_sampling(spark, sf_dir):
    """Real video path: synthesized AVIs parse back with the synthesis
    contract's geometry, every-k sampling emits the right frame
    indexes, and frame checksums are independently recomputable from
    the per-frame digest rule."""
    import hashlib

    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        _avi_params_from_text,
        sample_video_frames,
        synthesize_avi,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = synthesize_avi(docs)
    frames = {}
    for r in sample_video_frames(media, every_k=2).collect():
        frames.setdefault(r.doc_id, []).append(r)
    assert len(frames) == 30
    for d in docs.collect():
        seed, w, h, n = _avi_params_from_text(d.text)
        rows = sorted(frames[d.doc_id], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == list(range(0, n, 2))
        for r in rows:
            assert (r.width, r.height, r.n_frames) == (w, h, n)
            npix = w * h * 3
            digest = hashlib.md5(f"{seed}-{r.frame_idx}".encode()).digest()
            stream = (digest * ((npix + len(digest) - 1) // len(digest)))[:npix]
            assert r.frame_checksum == hashlib.md5(stream.hex().encode()).hexdigest()

    junk = spark.createDataFrame(
        [(900, b"RIFFxxxxAVI not really")], "doc_id long, content binary"
    )
    bad = sample_video_frames(junk).collect()
    assert len(bad) == 1 and bad[0].frame_checksum is None


def test_kmeans_portable_iter1_is_seed_assignment(spark):
    # iters=1 must be a pure nearest-seed pass: cluster ids are the
    # first-k-by-id vectors' ranks, every vector lands on its cosine
    # argmax with ties to the lowest cluster id.
    rows = [
        (10, [1.0, 0.0]),
        (20, [0.0, 1.0]),
        (30, [1.0, 0.1]),   # nearer seed 0
        (40, [0.1, 1.0]),   # nearer seed 1
        (50, [-1.0, 0.0]),  # anti-parallel to seed 0 -> seed 1 wins at 0.0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r["vec_id"]: (r["cluster_id"], r["score"])
        for r in similarity.kmeans_portable(df, k=2, iters=1).collect()
    }
    assert out[10] == (0, 1.0) and out[20] == (1, 1.0)
    assert out[30][0] == 0 and out[40][0] == 1
    assert out[50][0] == 1 and out[50][1] == 0.0


def test_kmeans_portable_converges_on_two_bundles(spark):
    # Two tight bundles with one seed in each: membership must be
    # coherent after convergence.
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [0.98, 0.02]),
        (4, [0.99, 0.01]),
        (5, [0.01, 0.99]),
        (6, [0.02, 0.98]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r["cluster_id"] for r in similarity.kmeans_portable(df, k=2, iters=3).collect()}
    assert out[1] == out[3] == out[4]
    assert out[2] == out[5] == out[6]
    assert len(set(out.values())) == 2


def test_kmeans_portable_empty_cluster_keeps_seed_centroid(spark):
    # Seeds 0 and 1 are PARALLEL vectors (cosine exactly 1.0 to every
    # point in their common direction), so every pass-1 assignment ties
    # and breaks to cluster 0 — cluster 1 is genuinely VACATED. The
    # update must keep cluster 1's seed centroid (not NaN from a 0/0
    # mean), which is observable in pass 2: scores against it stay
    # finite and the tie-break still sends its direction to cluster 0.
    rows = [
        (1, [1.0, 0.0]),
        (2, [2.0, 0.0]),  # parallel to seed 0 -> ties, cluster 0 wins
        (3, [0.9, 0.1]),
        (4, [0.8, 0.2]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r["vec_id"]: (r["cluster_id"], r["score"])
        for r in similarity.kmeans_portable(df, k=2, iters=2).collect()
    }
    assert len(out) == 4
    import math

    for cid, score in out.values():
        assert cid in (0, 1)
        assert score is not None and math.isfinite(score)
    # Pass 1 empties cluster 1; pass 2 re-scores against the PRESERVED
    # seed [2, 0]. Vector 1 ([1,0]) has cosine exactly 1.0 to that seed
    # direction but also ties against the pass-2 cluster-0 mean only if
    # the mean is parallel — it is not (mean pulls toward [0.85,0.15]
    # territory), so the exact-1.0 match proves the vacated centroid
    # survived: a NaN centroid could never produce a winning score.
    assert out[1] == (1, 1.0) and out[2] == (1, 1.0)
    assert out[3][0] == 0 and out[4][0] == 0


def test_canonical_keep_quality_argmax_and_singletons(spark):
    docs = spark.createDataFrame(
        [
            (1, "short"),                                # low quality (n_tok < 5)
            (2, "the quick brown fox jumps clean text"), # high quality
            (3, "another fine sentence with words here"),
        ],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    out = {r["doc_id"]: r for r in dedup.canonical_keep(docs, pairs, text.quality_score("text")).collect()}
    # 1 and 2 share a component; 2 has higher quality and survives.
    assert out[1]["component"] == out[2]["component"] == 1
    assert out[1]["canonical_id"] == 2 and not out[1]["keep"]
    assert out[2]["keep"] and out[2]["group_size"] == 2
    # 3 is a singleton keeping itself.
    assert out[3]["keep"] and out[3]["canonical_id"] == 3 and out[3]["group_size"] == 1


def test_canonical_keep_tie_breaks_to_lowest_id(spark):
    docs = spark.createDataFrame(
        [(7, "the quick brown fox jumps today"), (8, "the quick brown fox jumps today")],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(7, 8)], ["id_a", "id_b"])
    out = {r["doc_id"]: r for r in dedup.canonical_keep(docs, pairs, text.quality_score("text")).collect()}
    assert out[7]["keep"] and not out[8]["keep"] and out[8]["canonical_id"] == 7


def test_split_leakage_report_flags_cross_split_near_dups(spark):
    from accounts_receivable_data_pipeline_api_spark.operators import curation

    splits = spark.createDataFrame(
        [(1, "train"), (2, "test"), (3, "train"), (4, "val")],
        ["doc_id", "split"],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4)], ["id_a", "id_b"]
    )  # 1-2 train/test leak, 1-3 clean, 2-4 test/val leak
    rows = {
        (r["split_a"], r["split_b"]): r["n_leaking_pairs"]
        for r in curation.split_leakage_report(splits, pairs).collect()
    }
    assert rows == {("train", "test"): 1, ("test", "val"): 1}


def test_split_leakage_empty_after_canonical_dedup(spark):
    """The release-pipeline property: dedup via canonical_keep BEFORE
    assign_split leaves no near-dup pair with both endpoints surviving,
    so the report over survivors is empty by construction."""
    from accounts_receivable_data_pipeline_api_spark.operators import curation, dedup, text

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox document number {i % 3} sentence") for i in range(9)],
        ["doc_id", "text"],
    )
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8)
    decision = dedup.canonical_keep(docs, pairs, text.quality_score("text"))
    survivors = decision.filter("keep").select("doc_id")
    splits = curation.assign_split(docs.join(survivors, "doc_id", "left_semi"), "doc_id")
    report = curation.split_leakage_report(splits, pairs)
    # pairs among dropped docs don't matter; pairs with a surviving
    # endpoint have the OTHER endpoint dropped, so no pair survives
    # with both endpoints split-assigned.
    assert report.count() == 0


def test_kmeans_portable_more_clusters_than_vectors(spark):
    # k > n: only n seeds exist; the map stays total over the vectors
    # and uses only the clusters that have seeds.
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = similarity.kmeans_portable(df, k=5, iters=2).collect()
    assert len(out) == 3
    assert all(0 <= r["cluster_id"] < 3 for r in out)


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """The scale path for agg_percentiles: approx_percentile is a
    single-pass mergeable sketch (exact percentile buffers every value
    per group — fine per bounded group, wrong for billion-row groups).
    The sketch's guarantee is a RANK bound, not a value bound (it
    returns an actual data value within accuracy^-1 * n ranks of the
    target; adjacent values can be arbitrarily far apart), so the
    assertion checks rank error: at accuracy=10000 that is
    ceil(n/10000) + 1 ranks."""
    import bisect
    import math

    from pyspark.sql import functions as F
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    orders = load_table(spark, sf_dir, "orders")
    both = (
        orders.groupBy("o_orderpriority")
        .agg(
            F.sort_array(F.collect_list("o_totalprice")).alias("vals"),
            F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("approx_p50"),
            F.expr("approx_percentile(o_totalprice, 0.9, 10000)").alias("approx_p90"),
        )
        .collect()
    )
    assert both
    for r in both:
        vals = r["vals"]
        n = len(vals)
        bound = math.ceil(n / 10000) + 1
        for q, approx in ((0.5, r["approx_p50"]), (0.9, r["approx_p90"])):
            # rank window of the returned value within the sorted group
            lo = bisect.bisect_left(vals, approx)
            hi = bisect.bisect_right(vals, approx) - 1
            assert lo <= hi, f"approx value {approx} not an actual data value"
            target = q * (n - 1)
            dist = 0.0 if lo <= target <= hi else min(abs(lo - target), abs(hi - target))
            assert dist <= bound, (q, approx, dist, bound, n)


def test_cms_build_skips_null_items(spark, sf_dir):
    """NULL items carry no countable identity: a frame with NULLs must
    produce the identical sketch as its non-null subset (round-5 ADVICE:
    the md5 position expr null-propagates and None positions crashed the
    numpy kernel — quarantine, never fail)."""
    import numpy as np

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import cms_build

    vals = [("alpha",), ("beta",), (None,), ("alpha",), (None,)]
    df = spark.createDataFrame(vals, "token string")
    with_nulls = cms_build(df, "token")
    without = cms_build(df.filter(F.col("token").isNotNull()), "token")
    assert np.array_equal(with_nulls, without)
    assert int(with_nulls.sum()) == 3 * 4  # 3 non-null items x depth


def test_hll_registers_merge_and_estimate(spark, sf_dir):
    """Portable HLL invariants: (a) the register table over a union
    equals the groupBy-max merge of the halves' register tables (the
    mergeable-partial contract); (b) the estimate lands within 10% of
    the exact distinct count on the lineitem orderkeys; (c) registers
    are multiset-invariant (duplicating every row changes nothing)."""
    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    full = hll_registers(li, "l_orderkey", m=256)
    lo = hll_registers(li.filter(F.col("l_orderkey") % 2 == 0), "l_orderkey", m=256)
    hi = hll_registers(li.filter(F.col("l_orderkey") % 2 == 1), "l_orderkey", m=256)
    merged = (
        lo.unionByName(hi)
        .groupBy("bucket", "hll_m")
        .agg(F.max("max_rank").alias("max_rank"))
        .select("bucket", "max_rank", "hll_m")
    )
    assert full.exceptAll(merged).count() == 0
    assert merged.exceptAll(full).count() == 0

    doubled = hll_registers(li.unionByName(li), "l_orderkey", m=256)
    assert full.exceptAll(doubled).count() == 0
    assert doubled.exceptAll(full).count() == 0

    est = hll_estimate(full, m=256).collect()[0]
    # m-mismatch guard: estimating with the wrong m must raise at
    # execution, not silently pad the wrong number of empty registers
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with _pytest.raises((SparkRuntimeException, Py4JJavaError)):
        hll_estimate(full, m=1024).collect()
    exact = li.distinct().count()
    rel_err = abs(est["estimate"] - exact) / exact
    assert rel_err <= 0.10, (est["estimate"], exact, rel_err)
    # sum_scaled accounting: n_observed <= m, empties fill the rest
    assert est["n_observed"] <= 256
    assert est["sum_scaled"] >= (256 - est["n_observed"]) * (1 << 49)


def test_hll_large_range_correction_branch(spark):
    """Pin the large-range branch's math (round-7 VERDICT #1): a
    register table whose raw estimate exceeds 2^48/30 must return
    -2^48 * ln(1 - raw / 2^48), not the uncorrected raw. Registers are
    synthetic — 128 buckets all at rank 40 drive raw to ~alpha * 2^47,
    inside the correction window but below saturation."""
    import math

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hll_alpha,
        hll_estimate,
    )

    m = 128
    regs = spark.createDataFrame(
        [(b, 40, m) for b in range(m)], "bucket long, max_rank int, hll_m int"
    )
    est = hll_estimate(regs, m=m).collect()[0]
    sum_scaled = m * (1 << (49 - 40))
    assert est["sum_scaled"] == sum_scaled
    raw = hll_alpha(m) * (float(m) * float(m) * float(1 << 49)) / float(sum_scaled)
    assert raw > (1 << 48) / 30.0  # the branch actually fires
    expected = -float(1 << 48) * math.log(1.0 - raw / float(1 << 48))
    assert abs(est["estimate"] - expected) <= 1e-5 * expected
    # and the correction matters: it sits visibly ABOVE the raw value
    assert est["estimate"] > raw


def test_hll_saturation_raises(spark):
    """A sketch whose raw estimate reaches the 48-bit hash space is
    unrecoverable — the plan must raise, never return a confidently
    wrong number (all 128 registers at max rank 49)."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hll_estimate,
    )

    m = 128
    regs = spark.createDataFrame(
        [(b, 49, m) for b in range(m)], "bucket long, max_rank int, hll_m int"
    )
    with _pytest.raises((SparkRuntimeException, Py4JJavaError)):
        hll_estimate(regs, m=m).collect()


def test_hll_duplicate_bucket_guard_raises(spark, sf_dir):
    """hll_estimate over an UNFOLDED register table (raw unioned batch
    partials, duplicate buckets per group) must raise in-plan — without
    the guard, n_observed exceeds the distinct-bucket count, the empty
    registers under-pad, and the estimate is silently wrong while the
    hll_m check still passes (round-7 ADVICE)."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    folded = hll_registers(li, "l_orderkey", m=256)
    unfolded = folded.unionByName(folded)  # two partials, NOT re-folded
    with _pytest.raises((SparkRuntimeException, Py4JJavaError)):
        hll_estimate(unfolded, m=256).collect()


def test_hll_portable_tracks_hllpp(spark, sf_dir):
    """Divergence cross-check the round-7 VERDICT asked for: the
    portable 48-bit HLL and Spark's built-in HLL++ (64-bit) must BOTH
    track the exact distinct count at test scale — if the portable hash
    path regressed (width, rank base, scale), this is the tripwire that
    catches it against an independent sketch implementation."""
    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    exact = li.distinct().count()
    portable = hll_estimate(hll_registers(li, "l_orderkey", m=1024), m=1024).collect()[
        0
    ]["estimate"]
    hllpp = li.agg(F.approx_count_distinct("l_orderkey", rsd=0.01)).collect()[0][0]
    assert abs(portable - exact) / exact <= 0.07, (portable, exact)
    assert abs(hllpp - exact) / exact <= 0.03, (hllpp, exact)
    assert abs(portable - hllpp) / exact <= 0.10


def test_bm25_ranking_semantics(spark):
    """BM25 contract on a hand-built corpus: only docs containing at
    least one query term are scored; higher term frequency outranks
    lower at equal length; a rarer term outweighs a common one; ranks
    are contiguous from 1 in score-desc order."""
    from accounts_receivable_data_pipeline_api_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple apple apple banana"),
            (2, "apple banana cherry date"),
            (3, "banana banana banana banana"),
            (4, "cherry date elderberry fig"),
            (5, "grape kiwi lemon mango"),
        ],
        ["doc_id", "text"],
    )
    queries = spark.createDataFrame(
        [("qa", "apple"), ("qr", "elderberry banana")], ["query_id", "query_text"]
    )
    rows = bm25_topk(docs, queries, k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # qa: docs 1 and 2 only; tf=3 beats tf=1 at equal dl
    qa = sorted(by_q["qa"], key=lambda r: r["rank"])
    assert [r["doc_id"] for r in qa] == [1, 2]
    assert qa[0]["score"] > qa[1]["score"] > 0
    # qr: elderberry (df=1) must outweigh banana (df=3) -> doc 4 first
    qr = sorted(by_q["qr"], key=lambda r: r["rank"])
    assert qr[0]["doc_id"] == 4
    assert {r["doc_id"] for r in qr} == {1, 2, 3, 4}
    for grp in (qa, qr):
        assert [r["rank"] for r in grp] == list(range(1, len(grp) + 1))
        assert all(
            grp[i]["score"] >= grp[i + 1]["score"] for i in range(len(grp) - 1)
        )


def test_winnow_fingerprint_guarantee(spark):
    """Winnowing contracts (SIGMOD'03): identical texts fingerprint
    identically; any shared substring of length >= k + window - 1
    yields >= 1 shared fingerprint; sub-k texts yield nothing; the
    pair operator separates a real copy from unrelated text."""
    from accounts_receivable_data_pipeline_api_spark.operators.dedup import (
        winnow_overlap_pairs,
    )
    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        winnow_fingerprints,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    shared_run = "zygomatic arch measurement protocol"  # >= k+w-1 = 11 chars
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact copy
            (3, "unrelated words entirely: " + shared_run),
            (4, shared_run + " appended to a different tail of prose"),
            (5, "short"),  # < k chars
        ],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, k=8, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] == by_doc[2]
    assert 5 not in by_doc  # sub-k text: no grams, no fingerprints
    # shared >= 11-char run between 3 and 4 guarantees >= 1 shared fp
    assert by_doc[3] & by_doc[4]
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in winnow_overlap_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (3, 4) not in pairs  # partial overlap stays below 0.5
    # stop-fingerprint pruning keeps soundness: surviving pairs subset
    pruned = {
        (r["id_a"], r["id_b"])
        for r in winnow_overlap_pairs(docs, threshold=0.5, max_fp_df=3).collect()
    }
    assert pruned <= set(pairs)


def test_jpeg_decoder_three_component_ycbcr_path():
    """The JPEG decoder is general for 4:4:4 color, not just the
    grayscale fixture: a hand-built 3-component baseline JPEG (one MCU,
    each YCbCr plane block-constant, per-component DC prediction,
    interleaved scan) must decode to exactly the JFIF YCbCr->RGB
    conversion of the encoded constants."""
    import struct

    import numpy as np

    from accounts_receivable_data_pipeline_api_spark.operators.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _JpegBitWriter,
        _jpeg_canonical_codes,
        _jpeg_pixels,
    )

    y_v, cb_v, cr_v = 120, 90, 180
    dc_codes = {
        sym: (code, ln)
        for sym, code, ln in _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    }
    ac_codes = {
        sym: (code, ln)
        for sym, code, ln in _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    }
    wr = _JpegBitWriter()
    for v in (y_v, cb_v, cr_v):  # one MCU: one block per component
        diff = 8 * (v - 128)  # per-component predictor starts at 0
        s = abs(diff).bit_length()
        code, ln = dc_codes[s]
        wr.put(code, ln)
        if s:
            wr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        eob, eob_len = ac_codes[0x00]
        wr.put(eob, eob_len)
    scan = wr.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes([1] * 64))
    sof0 = seg(
        0xC0,
        struct.pack(">BHHB", 8, 8, 8, 3) + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht_dc = seg(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    dht_ac = seg(0xC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    content = (
        b"\xff\xd8" + app0 + dqt + sof0 + dht_dc + dht_ac + sos + scan + b"\xff\xd9"
    )

    out = _jpeg_pixels(content)
    assert out is not None
    w, h, nc, stream = out
    assert (w, h, nc) == (8, 8, 3)
    # independent expectation: constant planes through the JFIF matrix
    y, cb, cr = float(y_v), float(cb_v) - 128.0, float(cr_v) - 128.0
    exp_px = np.clip(
        np.rint(
            np.array(
                [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb]
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    assert stream == bytes(exp_px) * 64


def test_excise_duplicate_spans_contracts(spark):
    """ExactSubstr span removal: (a) chars are conserved — removed +
    len(cleaned) == len(normalized); (b) ALL copies of a duplicated
    run are cut (the Lee et al. policy), verified on two docs sharing
    a long verbatim run embedded in distinct surroundings; (c) docs
    sharing nothing long enough are untouched; (d) a fully-duplicated
    doc cleans to the empty string."""
    import hashlib

    from accounts_receivable_data_pipeline_api_spark.operators.dedup import (
        excise_duplicate_spans,
    )

    run = "the shared verbatim passage that recurs across documents " * 2  # 114 chars
    docs = spark.createDataFrame(
        [
            (1, "alpha intro text distinct one. " + run + " alpha outro distinct."),
            (2, "beta opening words differ a lot. " + run + " beta closing words."),
            (3, run.strip()),  # the run IS the whole doc
            (4, "entirely unrelated content with no duplicated long spans here."),
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in excise_duplicate_spans(docs, k=40, min_len=50).collect()}
    import re as _re

    def norm(s):
        return _re.sub(r"\s+", " ", s.lower()).strip()

    # (b) + (a): docs 1, 2, 3 all lose the run
    for d in (1, 2, 3):
        assert rows[d]["n_spans"] >= 1, rows[d]
        assert rows[d]["n_chars_removed"] >= len(run.strip()) - 39
    # (c) untouched doc keeps its exact normalized hash
    assert rows[4]["n_spans"] == 0
    assert rows[4]["cleaned_hash"] == hashlib.md5(
        norm("entirely unrelated content with no duplicated long spans here.").encode()
    ).hexdigest()
    # (d) whole-doc duplicate cleans to empty
    assert rows[3]["cleaned_hash"] == hashlib.md5(b"").hexdigest()
    assert rows[3]["n_chars_removed"] == len(norm(run.strip()))
    # (a) partial excision: doc 1 keeps its distinct head/tail, so the
    # cleaned hash differs from both the untouched hash and empty
    t1 = norm("alpha intro text distinct one. " + run + " alpha outro distinct.")
    assert 0 < rows[1]["n_chars_removed"] < len(t1)
    assert rows[1]["cleaned_hash"] not in (
        hashlib.md5(t1.encode()).hexdigest(),
        hashlib.md5(b"").hexdigest(),
    )


def test_hdr_registers_merge_and_quantile_invariant(spark, sf_dir):
    """HDR quantile sketch properties: (1) registers built over the
    whole table equal the SUM-merge of per-split partials (mergeable
    partial law); (2) bucket law is exact — every value lands in a
    bucket whose [lb, ub] contains it, widths bounded at 2^-sub_bits
    relative; (3) the picked quantile bucket contains the exact disc
    rank-r value for every q; (4) non-positive values raise in-plan."""
    import pytest

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hdr_quantiles,
        hdr_registers,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("v"),
        )
    )
    full = hdr_registers(li, "v", ["l_returnflag"])
    split_a = li.filter(F.col("v") % 2 == 0)
    split_b = li.filter(F.col("v") % 2 == 1)
    merged = (
        hdr_registers(split_a, "v", ["l_returnflag"])
        .unionByName(hdr_registers(split_b, "v", ["l_returnflag"]))
        .groupBy("l_returnflag", "exp", "sub", "lb", "ub", "hdr_sub_bits")
        .agg(F.sum("cnt").alias("cnt"))
        .select(*full.columns)
    )
    assert full.exceptAll(merged).count() == 0
    assert merged.exceptAll(full).count() == 0

    # bucket law: lb <= v <= ub for every value, rel width bound holds
    joined = li.join(full, "l_returnflag").filter(
        (F.col("v") >= F.col("lb")) & (F.col("v") <= F.col("ub"))
    )
    assert joined.select("v").distinct().count() == li.select("v").distinct().count()
    bad_width = full.filter(
        (F.col("exp") >= 5) & ((F.col("ub") - F.col("lb") + 1) * 32 > F.col("lb"))
    )
    assert bad_width.count() == 0

    # quantile invariant: exact disc rank-r value inside picked bucket
    picks = hdr_quantiles(full, ["l_returnflag"])
    arrs = li.groupBy("l_returnflag").agg(
        F.sort_array(F.collect_list("v")).alias("arr")
    )
    checked = picks.join(arrs, "l_returnflag").select(
        "q",
        F.element_at("arr", F.col("rank").cast("int")).alias("exact"),
        "q_lb",
        "q_ub",
    )
    rows = checked.collect()
    assert len(rows) == 3 * 3  # 3 flags x 3 quantiles
    for r in rows:
        assert r.q_lb <= r.exact <= r.q_ub, r

    with pytest.raises(Exception, match="positive"):
        hdr_registers(
            spark.createDataFrame([(1, 0)], "g int, v long"), "v", ["g"]
        ).collect()


def test_hdr_quantiles_rejects_mixed_sub_bits_and_null_values(spark):
    """Round-9 review guards: hdr_quantiles raises in-plan when the
    register table mixes hdr_sub_bits stamps (two incompatible bucket
    systems in one walk would silently double n); hdr_registers raises
    on NULL values (a NULL would bin to a phantom bucket that shifts
    every quantile — and diverges cross-engine on NULL ordering)."""
    import pytest

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hdr_quantiles,
        hdr_registers,
    )

    vals = spark.createDataFrame([(1, 10), (1, 300)], "g int, v long")
    mixed = hdr_registers(vals, "v", ["g"], sub_bits=5).unionByName(
        hdr_registers(vals, "v", ["g"], sub_bits=6)
    )
    with pytest.raises(Exception, match="hdr_sub_bits"):
        hdr_quantiles(mixed, ["g"]).collect()

    with pytest.raises(Exception, match="NULL"):
        hdr_registers(
            spark.createDataFrame([(1, None)], "g int, v long"), "v", ["g"]
        ).collect()


def test_cms_lookup_zero_traffic_item_estimates_zero(spark):
    """A watch item absent from the counted stream must come back with
    its correct CMS estimate — 0 when all its cells are empty — not
    silently vanish from the output (round-9 review: inner-join drop)."""
    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        cms_counters,
        cms_lookup,
    )

    counted = spark.createDataFrame(
        [(f"tok{i % 3}",) for i in range(30)], "item string"
    )
    counters = cms_counters(counted, "item", depth=4, width=4096)
    watch = spark.createDataFrame(
        [("tok0",), ("never-seen-domain.example",)], "item string"
    )
    got = {r["item"]: r["cms_est"] for r in cms_lookup(counters, watch, "item", depth=4, width=4096).collect()}
    assert set(got) == {"tok0", "never-seen-domain.example"}
    assert got["tok0"] >= 10  # one-sided: est >= true
    # width 4096 over 3 distinct tokens: collision-free w.h.p., so the
    # never-seen item's cells are all absent -> exact zero estimate
    assert got["never-seen-domain.example"] == 0


# ---------------------------------------------------------------------------
# Graph analytics (operators/graph.py)
# ---------------------------------------------------------------------------


def _pagerank_reference(pairs, damping=0.85, iterations=3, dp=6):
    """Driver-side mirror of pagerank_portable's exact math (round-6
    per-term contributions, order-free sums, raw IEEE rank updates)."""
    from collections import defaultdict
    from decimal import Decimal

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(adj)
    n = len(nodes)
    base = (1.0 - damping) / n
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        s = defaultdict(Decimal)
        for u in nodes:
            inv = 1.0 / len(adj[u])
            c = round(r[u] * inv, dp)
            for v in adj[u]:
                s[v] += Decimal(repr(c))
        r = {v: base + damping * float(s[v]) for v in nodes}
    return r


def test_pagerank_star_graph(spark):
    """Hub-and-spokes: the hub out-ranks every leaf, leaves tie, and the
    ranks equal the driver-side reference mirror bit-for-bit."""
    from accounts_receivable_data_pipeline_api_spark.operators import graph

    pairs_py = [(0, i) for i in range(1, 6)]
    pairs = spark.createDataFrame(pairs_py, ["id_a", "id_b"])
    got = {r.node: r["rank"] for r in graph.pagerank_portable(pairs).collect()}
    ref = _pagerank_reference(pairs_py)
    assert got == ref
    assert got[0] > got[1]
    assert len({got[i] for i in range(1, 6)}) == 1
    # rank mass is conserved up to per-term rounding
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_cycle_stays_uniform(spark):
    """On a k-regular graph the uniform distribution is stationary:
    every node keeps (approximately) rank 1/N through every round, and
    symmetry is exact — all ranks identical."""
    from accounts_receivable_data_pipeline_api_spark.operators import graph

    n = 6
    pairs = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], ["id_a", "id_b"]
    )
    got = [r["rank"] for r in graph.pagerank_portable(pairs).collect()]
    assert len(set(got)) == 1
    assert abs(got[0] - 1.0 / n) < 1e-5


def test_pagerank_two_components_independent(spark):
    """Disconnected components never exchange mass: a dense K3 and an
    isolated edge produce rank profiles identical to running each
    component alone (modulo the shared 1/N init)."""
    from accounts_receivable_data_pipeline_api_spark.operators import graph

    pairs_py = [(1, 2), (2, 3), (1, 3), (10, 11)]
    pairs = spark.createDataFrame(pairs_py, ["id_a", "id_b"])
    got = {r.node: r["rank"] for r in graph.pagerank_portable(pairs).collect()}
    ref = _pagerank_reference(pairs_py)
    assert got == ref
    assert got[10] == got[11]


def test_triangle_counts_known_graph(spark):
    """Explicit fixture: one triangle with a pendant, a K4 (every node
    in C(3,2)=3 triangles), and a triangle-free star."""
    from accounts_receivable_data_pipeline_api_spark.operators import graph

    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    edges += [(a, b) for a in (10, 11, 12, 13) for b in (10, 11, 12, 13) if a < b]
    edges += [(20, 21), (20, 22), (20, 23)]
    pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r.node: r.n_triangles for r in graph.triangle_counts(pairs).collect()}
    expect = {1: 1, 2: 1, 3: 1, 4: 0, 10: 3, 11: 3, 12: 3, 13: 3,
              20: 0, 21: 0, 22: 0, 23: 0}
    assert got == expect


def test_triangle_counts_random_vs_bruteforce(spark):
    """Property: the degree-ordered edge-iterator counts exactly the
    brute-force triangle set on seeded random graphs (including dup
    pairs, reversed pairs, and self-loops, which must all be ignored
    or canonicalized)."""
    import itertools
    import random

    from accounts_receivable_data_pipeline_api_spark.operators import graph

    for seed, n, m in [(11, 12, 25), (12, 20, 60), (13, 8, 40)]:
        rng = random.Random(seed)
        raw = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edge_set = {(min(a, b), max(a, b)) for a, b in raw if a != b}
        expect = {v: 0 for e in edge_set for v in e}
        for x, y, z in itertools.combinations(sorted(expect), 3):
            if {(x, y), (x, z), (y, z)} <= edge_set:
                for v in (x, y, z):
                    expect[v] += 1
        pairs = spark.createDataFrame(raw, ["id_a", "id_b"])
        got = {r.node: r.n_triangles for r in graph.triangle_counts(pairs).collect()}
        assert got == expect, f"seed {seed}"


def test_kcore_nodes_matches_bruteforce_and_certifies(spark):
    """Property: on random multigraph-ish pair lists (duplicates, both
    orientations, self-loops), fixed-round k-core peeling returns
    exactly the brute-force survivor set with exact induced degrees,
    and the converged certificate (monotone count check) matches the
    brute-force fixed-point test. Also pins the honest failure mode:
    rounds too few => converged=False, never a silently-wrong core."""
    import random

    from accounts_receivable_data_pipeline_api_spark.operators import graph

    def brute(edges, k, rounds):
        sym = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        alive = {n for e in sym for n in e}
        counts = [len(alive)]
        for _ in range(rounds):
            deg: dict = {}
            for a, b in sym:
                if a in alive and b in alive:
                    deg[a] = deg.get(a, 0) + 1
                    deg[b] = deg.get(b, 0) + 1
            alive = {n for n in alive if deg.get(n, 0) >= k}
            counts.append(len(alive))
        deg = {}
        for a, b in sym:
            if a in alive and b in alive:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
        conv = counts[-1] == counts[-2]
        return {(n, deg.get(n, 0), conv) for n in alive}

    rng = random.Random(3)
    for trial in range(3):
        edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(35)]
        edges += [(b, a) for a, b in edges[:5]]  # reversed duplicates
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        for k in (2, 3):
            got = {
                (r.node, r.degree, r.converged)
                for r in graph.kcore_nodes(df, k=k, rounds=3).collect()
            }
            assert got == brute(edges, k, 3), (trial, k)
    # a long path needs one round per peeled layer: on the 6-node
    # path 0-1-2-3-4-5 at k=2 the alive counts run [6, 4, 2, 0, 0],
    # so 2 rounds is NOT converged (and says so) while 4 rounds is
    # converged with an empty core
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["id_a", "id_b"]
    )
    few = graph.kcore_nodes(path, k=2, rounds=2).collect()
    assert few and all(not r.converged for r in few)
    assert graph.kcore_nodes(path, k=2, rounds=4).collect() == []


def test_edit_distance_pairs_known_typos(spark):
    """Explicit fixture: each corruption family (deletion, insertion,
    substitution, adjacent transposition at d=2) against its source."""
    vocab = spark.createDataFrame(
        [
            ("spark",),
            ("sprk",),     # deletion of 'a'       -> d=1
            ("sparkk",),   # insertion of 'k'      -> d=1
            ("szark",),    # substitution p->z     -> d=1
            ("sprak",),    # transposition         -> d=2: must NOT pair with spark
            ("window",),   # unrelated
        ],
        ["word"],
    )
    out = dedup.edit_distance_pairs(vocab, word_col="word")
    got = {tuple(sorted((r.word_a, r.word_b))): r.distance for r in out.collect()}
    expect_pairs = {
        tuple(sorted(p))
        for p in [("spark", "sprk"), ("spark", "sparkk"), ("spark", "szark"),
                  ("sprk", "sprak"), ("sprak", "sparkk")]
    }
    # recompute the TRUE d<=1 set brute-force and require exact equality
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    words = [r.word for r in vocab.collect()]
    brute = {
        tuple(sorted((x, y))): lev(x, y)
        for x, y in itertools.combinations(words, 2)
        if lev(x, y) <= 1
    }
    assert got == brute
    assert tuple(sorted(("spark", "sprak"))) not in got  # d=2 excluded
    assert expect_pairs & set(got)  # sanity: the intended d=1 pairs exist


def test_edit_distance_pairs_blocking_complete_random(spark):
    """Property: on random short words over a 3-letter alphabet (dense
    d=1 neighborhoods), the deletion-blocked join finds EXACTLY the
    brute-force d<=1 pair set — completeness of the blocking and
    correctness of the verify filter."""
    import itertools
    import random

    rng = random.Random(7)
    words = list({"".join(rng.choice("abc") for _ in range(rng.randint(4, 6)))
                  for _ in range(60)})
    vocab = spark.createDataFrame([(w,) for w in words], ["word"])
    out = dedup.edit_distance_pairs(vocab, word_col="word")
    got = {tuple(sorted((r.word_a, r.word_b))) for r in out.collect()}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    brute = {
        tuple(sorted((x, y)))
        for x, y in itertools.combinations(words, 2)
        if lev(x, y) <= 1
    }
    assert got == brute
    assert len(brute) > 0  # fixture really exercises the path


def test_edit_distance_pairs_min_len_and_d3_guard(spark):
    """Words under min_len never pair (the skew guard is a hard
    filter), and the unimplemented d>=3 path raises."""
    import pytest as _pytest

    vocab = spark.createDataFrame([("ab",), ("ac",), ("abcd",)], ["word"])
    assert dedup.edit_distance_pairs(vocab, word_col="word").count() == 0
    with _pytest.raises(NotImplementedError):
        dedup.edit_distance_pairs(vocab, word_col="word", max_distance=3)


def test_edit_distance_pairs_d2_blocking_complete_random(spark):
    """Property at d=2 (round 10): on random short words over a
    3-letter alphabet (dense edit neighborhoods), the 2-deletion
    (i,j) pair blocking finds EXACTLY the brute-force d<=2 pair set
    with exact distances — completeness of the pair enumeration
    (including the i=0 identity/single-deletion block) and soundness
    of the levenshtein verify. Transpositions (distance 2 in plain
    Levenshtein) MUST now pair, unlike at d=1."""
    import itertools
    import random

    rng = random.Random(11)
    words = list({"".join(rng.choice("abc") for _ in range(rng.randint(4, 7)))
                  for _ in range(50)})
    vocab = spark.createDataFrame([(w,) for w in words], ["word"])
    out = dedup.edit_distance_pairs(vocab, word_col="word", max_distance=2)
    got = {
        tuple(sorted((r.word_a, r.word_b))): r.distance for r in out.collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    brute = {
        tuple(sorted((x, y))): lev(x, y)
        for x, y in itertools.combinations(words, 2)
        if lev(x, y) <= 2
    }
    assert got == brute
    assert any(d == 2 for d in brute.values())  # d=2 pairs exercised
    # a transposition fixture pairs at d=2
    v2 = spark.createDataFrame([("spark",), ("sprak",)], ["word"])
    out2 = dedup.edit_distance_pairs(v2, word_col="word", max_distance=2)
    assert [r.distance for r in out2.collect()] == [2]


# ---------------------------------------------------------------------------
# Hybrid retrieval: tfidf_query_topk + reciprocal-rank fusion
# ---------------------------------------------------------------------------


def test_collocation_topk_manual_and_bruteforce(spark):
    """Hand fixture plus a python brute-force twin: lift counts, the
    min_count floor, the (lift desc, w1, w2) tie-break, and the top-k
    cut all match an independent recomputation over the same corpus.
    """
    from collections import Counter

    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        collocation_topk,
    )

    rows = [
        (1, "new york is a big city"),
        (2, "New York and new jersey"),
        (3, "the big apple is new york"),
        (4, "a city so big it never sleeps"),
        (5, "york new york new york"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [
        (r.w1, r.w2, r.n_ab, r.n_a, r.n_b, r.lift, r.rank)
        for r in collocation_topk(docs, min_count=2, topk=3)
        .orderBy("rank")
        .collect()
    ]

    toks = [t for _, s in rows for t in s.lower().split()]
    uni = Counter(toks)
    bi = Counter()
    for _, s in rows:
        ws = s.lower().split()
        bi.update(zip(ws, ws[1:]))
    n = len(toks)
    scored = [
        (w1, w2, c, uni[w1], uni[w2], float(c) * float(n) / (float(uni[w1]) * float(uni[w2])))
        for (w1, w2), c in bi.items()
        if c >= 2
    ]
    scored.sort(key=lambda t: (-t[5], t[0], t[1]))
    want = [t + (i + 1,) for i, t in enumerate(scored[:3])]
    assert got == want
    # "new york" must be the top collocation of this fixture
    assert got[0][:2] == ("new", "york")
    # the top-k selection is TakeOrdered (distributed partial top-k),
    # never a corpus-wide single-partition sort
    plan = collocation_topk(docs, min_count=2, topk=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_tfidf_query_topk_manual(spark):
    """4-doc fixture scored by hand: per-query scores are the decimal
    sums of round-6 tf*idf terms over DISTINCT query tokens, ranked
    score-desc with doc_id tie-break."""
    import math

    rows = [
        (1, "hash join hash join hash"),
        (2, "join table scan"),
        (3, "window agg window"),
        (4, "hash table"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    queries = spark.createDataFrame([("q1", "hash hash table")], ["query_id", "query_text"])
    out = text.tfidf_query_topk(docs, queries, k=10).collect()
    got = {(r.query_id, r.doc_id): (r.score, r.rank) for r in out}

    def idf(df_t):
        return math.log((4 + 1) / (df_t + 1)) + 1.0

    # df: hash->2, table->2; 'hash hash table' dedupes to {hash, table}
    s1 = round(3 * idf(2), 6)                      # doc 1: hash tf=3
    s2 = round(1 * idf(2), 6)                      # doc 2: table tf=1
    s4 = round(1 * idf(2), 6) + round(1 * idf(2), 6)  # doc 4: both
    assert got == {
        ("q1", 1): (s1, 1),
        ("q1", 4): (s4, 2),
        ("q1", 2): (s2, 3),
    }
    assert ("q1", 3) not in got  # doc 3 matches nothing
    assert got[("q1", 1)][0] == s1
    assert got[("q1", 4)][0] == s4
    assert got[("q1", 2)][0] == s2
    # ranking: s1 (3 hash hits) > s4 (two singles) > s2
    assert [got[("q1", d)][1] for d in (1, 4, 2)] == [1, 2, 3]


def test_rrf_fuse_manual_and_missing_docs(spark):
    """Known rank lists: fused score = sum of 1/(60+rank) over the
    rankers that list the doc; docs in only one list still surface;
    final ranking re-sorts by fused score with doc-id tie-break."""
    r1 = spark.createDataFrame(
        [("q", 101, 1), ("q", 102, 2), ("q", 103, 3)],
        ["query_id", "doc_id", "rank"],
    )
    r2 = spark.createDataFrame(
        [("q", 102, 1), ("q", 104, 2)], ["query_id", "doc_id", "rank"]
    )
    out = {r.doc_id: (r.score, r.rank) for r in text.rrf_fuse([r1, r2]).collect()}
    assert out[102] == (1.0 / 62 + 1.0 / 61, 1)
    assert out[101] == (1.0 / 61, 2)
    assert out[104] == (1.0 / 62, 3)
    assert out[103] == (1.0 / 63, 4)


def test_rrf_fuse_three_rankers_order_deterministic(spark):
    """With >2 rankers the fold order matters in IEEE float; the
    operator pins ranker-index order, so the score must equal the
    left-to-right Python fold over rankers 0,1,2 exactly."""
    frames = [
        spark.createDataFrame([("q", 7, r)], ["query_id", "doc_id", "rank"])
        for r in (3, 5, 11)
    ]
    out = text.rrf_fuse(frames, topk=5).collect()
    expect = 0.0
    for r in (3, 5, 11):
        expect = expect + 1.0 / (60 + r)
    assert len(out) == 1 and out[0].score == expect


def test_kmv_sample_exact_selection_and_shard_invariance(spark, sf_dir):
    """The KMV sample is EXACT integer selection: (a) it equals the k
    smallest distinct md5-derived fingerprints computed independently
    in Python; (b) the two-level shard tree is selection-invariant
    (shards=1 == shards=7); (c) multiset-invariant (duplicating rows
    changes nothing)."""
    import hashlib

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import kmv_sample
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    got = kmv_sample(orders, "o_custkey", k=16).collect()
    keys = {r["o_custkey"] for r in orders.collect()}
    expect = sorted(
        int(hashlib.md5(f"kmv:{k}".encode()).hexdigest()[:12], 16) for k in keys
    )[:16]
    assert [r["hv"] for r in sorted(got, key=lambda r: r["pos"])] == expect
    assert all(r["kmv_k"] == 16 for r in got)

    s1 = kmv_sample(orders, "o_custkey", k=16, shards=1).collect()
    s7 = kmv_sample(orders, "o_custkey", k=16, shards=7).collect()
    assert sorted((r["pos"], r["hv"]) for r in s1) == sorted(
        (r["pos"], r["hv"]) for r in s7
    )
    doubled = kmv_sample(orders.unionByName(orders), "o_custkey", k=16).collect()
    assert sorted((r["pos"], r["hv"]) for r in doubled) == sorted(
        (r["pos"], r["hv"]) for r in got
    )


def test_kmv_estimate_exact_mode_sketch_mode_and_guard(spark, sf_dir):
    """(a) Fewer than k distinct items -> the estimate IS the exact
    distinct count (theta = 1 branch); (b) at k << n the Beyer
    estimator lands within 3/sqrt(k-2) of the exact count; (c) a
    k-mismatch raises in-plan (the hll_m guard policy)."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        kmv_estimate,
        kmv_sample,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    exact = li.distinct().count()

    small = kmv_sample(li, "l_orderkey", k=exact + 10)
    est = kmv_estimate(small, k=exact + 10).collect()[0]
    assert est["estimate"] == float(exact)
    assert est["n_observed"] == exact

    k = 64
    sk = kmv_sample(li, "l_orderkey", k=k)
    est2 = kmv_estimate(sk, k=k).collect()[0]
    rel = abs(est2["estimate"] - exact) / exact
    assert rel <= 3.0 / (k - 2) ** 0.5, (est2["estimate"], exact, rel)

    with _pytest.raises((SparkRuntimeException, Py4JJavaError)):
        kmv_estimate(sk, k=128).collect()


def test_kmv_merge_law(spark, sf_dir):
    """The sample MERGES by union + re-selection: kmv over the whole
    input equals kmv_sample applied to the union of the halves'
    samples — the mergeable-partial contract that makes the same frame
    a partition partial, a shard sketch, and a cross-day rollup."""
    from pyspark.sql import Window

    from accounts_receivable_data_pipeline_api_spark.operators.sketch import kmv_sample
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    k = 32
    full = kmv_sample(li, "l_orderkey", k=k).collect()
    lo = kmv_sample(li.filter(F.col("l_orderkey") % 2 == 0), "l_orderkey", k=k)
    hi = kmv_sample(li.filter(F.col("l_orderkey") % 2 == 1), "l_orderkey", k=k)
    w = Window.orderBy("hv")
    merged = (
        lo.unionByName(hi)
        .select("hv")
        .distinct()
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .collect()
    )
    assert sorted((r["pos"], r["hv"]) for r in merged) == sorted(
        (r["pos"], r["hv"]) for r in full
    )


def test_kmv_overlap_exact_mode_and_estimates(spark):
    """Constructed sets with KNOWN overlap. Exact mode (fewer than k
    union distincts): jaccard is the true Jaccard and intersect_est
    recovers the true intersection; sketch mode (k << n): union and
    intersection estimates land near truth; theta soundness holds
    (hv_k of the union sample <= both groups' own thresholds)."""
    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        kmv_overlap,
        kmv_sample,
    )

    rows = [("A", i) for i in range(60)] + [("B", i) for i in range(40, 100)]
    df = spark.createDataFrame(rows, ["g", "item"])
    sample = kmv_sample(df, "item", k=256, group_cols=("g",))
    ov = kmv_overlap(sample, "g", k=256).collect()
    assert len(ov) == 1
    r = ov[0]
    assert (r["g_a"], r["g_b"]) == ("A", "B")
    # |A|=|B|=60, |A ∩ B| = 20, |A ∪ B| = 100 — exact mode
    assert r["n_union_obs"] == 100
    assert r["n_common"] == 20
    assert r["jaccard"] == 20.0 / 100.0
    assert r["union_est"] == 100.0
    assert abs(r["intersect_est"] - 20.0) < 1e-9
    # A-NOT-B (round 10), exact mode: the union sample IS the union,
    # so both difference estimates are the true set differences, and
    # the integer counts partition the union sample exactly
    assert r["n_a_only"] == 40 and r["n_b_only"] == 40
    assert r["n_a_only"] + r["n_b_only"] + r["n_common"] == r["n_union_obs"]
    assert abs(r["a_only_est"] - 40.0) < 1e-9
    assert abs(r["b_only_est"] - 40.0) < 1e-9

    big = [("A", i) for i in range(4000)] + [("B", i) for i in range(2000, 6000)]
    bdf = spark.createDataFrame(big, ["g", "item"])
    k = 256
    bs = kmv_sample(bdf, "item", k=k, group_cols=("g",))
    # k-mismatch guard: overlap over a sample built under a different
    # k must raise in-plan, not silently truncate the union estimate
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with _pytest.raises((SparkRuntimeException, Py4JJavaError)):
        kmv_overlap(bs, "g", k=128).collect()
    bov = kmv_overlap(bs, "g", k=k).collect()[0]
    assert abs(bov["union_est"] - 6000) / 6000 <= 3.0 / (k - 2) ** 0.5
    # intersection adds jaccard noise on top of the union estimator
    assert abs(bov["intersect_est"] - 2000) / 2000 <= 0.35, bov["intersect_est"]
    # sketch-mode A-NOT-B: counts partition the sample; estimates
    # partition union_est (one float rounding per product); each
    # difference (truth 2000) lands inside the theta-framework bound —
    # error scales with the UNION, so allow 0.35 * union like the
    # intersection
    assert (
        bov["n_a_only"] + bov["n_b_only"] + bov["n_common"]
        == bov["n_union_obs"]
    )
    part = bov["a_only_est"] + bov["b_only_est"] + bov["intersect_est"]
    assert abs(part - bov["union_est"]) < 1e-6
    assert abs(bov["a_only_est"] - 2000) <= 0.35 * 6000, bov["a_only_est"]
    assert abs(bov["b_only_est"] - 2000) <= 0.35 * 6000, bov["b_only_est"]
    # theta soundness: the union sample's threshold is <= each group's
    thetas = {
        r["g"]: r["hv"]
        for r in bs.groupBy("g").agg(F.max("hv").alias("hv")).collect()
    }
    union_theta = max(
        r["hv"]
        for r in bs.select("hv")
        .distinct()
        .orderBy("hv")
        .limit(k)
        .collect()
    )
    assert union_theta <= min(thetas.values())


def test_substring_search_completeness_vs_bruteforce(spark, sf_dir):
    """Trigram blocking is COMPLETE: the operator returns exactly the
    unblocked contains() matches — including a zero-match pattern —
    and a prebuilt posting index gives identical results."""
    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        substring_search,
        trigram_postings,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents")
    pats = spark.createDataFrame(
        [
            ("p1", "hash join"),
            ("p2", "window agg"),
            ("p3", "zzz never there"),
        ],
        ["pattern_id", "pattern"],
    )
    got = {
        (r["pattern_id"], r["doc_id"])
        for r in substring_search(docs, pats).collect()
    }
    brute = {
        (r["pattern_id"], r["doc_id"])
        for r in docs.crossJoin(pats)
        .filter(F.expr("instr(text, pattern) > 0"))
        .select("pattern_id", "doc_id")
        .collect()
    }
    assert got == brute
    assert not any(p == "p3" for p, _ in got)
    assert len(got) > 0  # the corpus vocabulary guarantees matches

    idx = trigram_postings(docs)
    got_idx = {
        (r["pattern_id"], r["doc_id"])
        for r in substring_search(docs, pats, postings=idx).collect()
    }
    assert got_idx == got


def test_substring_search_pattern_guards_in_plan(spark):
    """Round-10 guard contract (per-path, in-plan — no eager driver
    action at call time): the DIRECT path legally scans patterns
    shorter than 3 chars (instr needs no trigram blocking) but raises
    on NULL/empty patterns, which instr would silently drop or
    trivially match; the POSTINGS path raises on any pattern under 3
    chars (can't be trigram-blocked). All guards fire at collect(),
    via raise_error."""
    import pytest as _pytest

    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        substring_search,
        trigram_postings,
    )

    docs = spark.createDataFrame(
        [(1, "abcdef"), (2, "xyz")], ["doc_id", "text"]
    )
    short = spark.createDataFrame([("p1", "ab")], ["pattern_id", "pattern"])
    got = {
        (r["pattern_id"], r["doc_id"])
        for r in substring_search(docs, short).collect()
    }
    assert got == {("p1", 1)}
    for bad in (None, ""):
        pats = spark.createDataFrame(
            [("p1", bad)], "pattern_id string, pattern string"
        )
        with _pytest.raises(Exception, match="substring_search"):
            substring_search(docs, pats).collect()
    idx = trigram_postings(docs)
    with _pytest.raises(Exception, match="trigram-blocked"):
        substring_search(docs, short, postings=idx).collect()


def test_substring_search_prune_gram_completeness_guard(spark):
    """Round-10 ADVICE: an INCOMPLETE scan_prune_grams list used to
    fail silently (the pruned posting scan drops the missing gram's
    postings and the all-grams candidate test loses the match without
    error). Now it raises in-plan; a COMPLETE list still returns the
    full match set, and an empty list raises at call time."""
    import pytest as _pytest

    from accounts_receivable_data_pipeline_api_spark.operators.text import (
        substring_search,
        trigram_postings,
    )

    docs = spark.createDataFrame(
        [(1, "abcdef"), (2, "xyzkkk")], ["doc_id", "text"]
    )
    pats = spark.createDataFrame([("p1", "abcd")], ["pattern_id", "pattern"])
    idx = trigram_postings(docs)
    full = ["abc", "bcd"]  # every 3-substring of "abcd"
    got = {
        (r["pattern_id"], r["doc_id"])
        for r in substring_search(
            docs, pats, postings=idx, scan_prune_grams=full
        ).collect()
    }
    assert got == {("p1", 1)}
    with _pytest.raises(Exception, match="scan_prune_grams is missing"):
        substring_search(
            docs, pats, postings=idx, scan_prune_grams=["abc"]
        ).collect()
    with _pytest.raises(ValueError, match="scan_prune_grams is empty"):
        substring_search(docs, pats, postings=idx, scan_prune_grams=[])


def test_zorder_key_cross_engine_and_bijective(spark):
    """The SAME expression text computes the key in Spark and DuckDB
    (one formula, two engines — zero drift possible), the interleave
    is bijective on its domain, and out-of-range/null inputs raise
    in-plan instead of silently wrapping into wrong spatial cells."""
    import duckdb
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from accounts_receivable_data_pipeline_api_spark.operators.layout import (
        zorder_key,
        zorder_sql,
    )

    rows = [(x, y) for x in range(0, 64, 5) for y in range(0, 64, 7)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z_key"]
        for r in df.select("x", "y", zorder_key(["x", "y"], bits=6)).collect()
    }
    con = duckdb.connect()
    expect = {
        (x, y): z
        for x, y, z in con.execute(
            f"SELECT x, y, {zorder_sql(['x', 'y'], 6)} FROM "
            "(SELECT unnest($1) AS x, unnest($2) AS y)",
            [[r[0] for r in rows], [r[1] for r in rows]],
        ).fetchall()
    }
    assert got == expect
    assert len(set(got.values())) == len(rows)  # bijective on the grid

    bad = spark.createDataFrame([(64, 1)], ["x", "y"])
    with _pytest.raises((SparkRuntimeException, Py4JJavaError)):
        bad.select(zorder_key(["x", "y"], bits=6)).collect()
    withnull = spark.createDataFrame([(None, 1)], "x int, y int")
    with _pytest.raises((SparkRuntimeException, Py4JJavaError)):
        withnull.select(zorder_key(["x", "y"], bits=6)).collect()


def test_zorder_locality_beats_linear_layout(spark, tmp_path):
    """WHY z-order, quantitatively: on a uniform 2D grid written to 16
    files, a y-band predicate intersects EVERY file of an x-sorted
    layout (each file spans the full y range) but only a minority of
    the z-ordered files (near-square bounding boxes) — the file-stat
    skipping a 100 TB reader does with parquet min/max footers."""
    import pyarrow.parquet as pq

    from accounts_receivable_data_pipeline_api_spark.operators.layout import (
        zorder_layout,
    )

    rows = [(x, y) for x in range(128) for y in range(128)]
    df = spark.createDataFrame(rows, ["x", "y"])
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "linear")
    zorder_layout(df, ["x", "y"], bits=7, n_files=16).write.parquet(zdir)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(ldir)

    def y_band_files(d):
        import glob

        hit = total = 0
        for f in glob.glob(f"{d}/part-*.parquet"):
            md = pq.read_metadata(f)
            lo = min(
                md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups)
            )
            total += 1
            if lo <= 40 and hi >= 33:  # band 33 <= y <= 40
                hit += 1
        return hit, total

    z_hit, z_total = y_band_files(zdir)
    l_hit, l_total = y_band_files(ldir)
    assert l_hit == l_total  # linear-by-x: every file spans all y
    assert z_hit <= z_total // 2, (z_hit, z_total)


# ---------------------------------------------------------------------------
# Priority sampling (Duffield-Lund-Thorup) — round 11
# ---------------------------------------------------------------------------


def test_priority_sample_merge_law_and_layout_invariance(spark, sf_dir):
    """Priorities are row-local, so the top-(k+1) selection obeys the
    same idempotent bottom-k algebra as kmv_sample: sampling the UNION
    of per-shard top-(k+1) candidate sets reproduces the whole-corpus
    sample EXACTLY — rank, tau, and estimates included — which is what
    lets shards/days sample independently and a rollup re-sample the
    partials. The full output is also partition-layout-invariant."""
    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        priority_sample,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    k = 20
    cols = ("doc_id", "sample_rank", "ps_weight", "ps_priority", "ps_tau", "ps_est")

    def key(df):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    full = key(priority_sample(docs, "n_chars", k, "doc_id"))
    shards = [
        priority_sample(docs.filter(F.col("doc_id") % 3 == i), "n_chars", k + 1, "doc_id")
        for i in range(3)
    ]
    cand = shards[0].unionByName(shards[1]).unionByName(shards[2]).select(
        "doc_id", "lang", "n_chars"
    )
    merged = key(priority_sample(cand, "n_chars", k, "doc_id"))
    assert merged == full
    relaid = key(priority_sample(docs.repartition(13), "n_chars", k, "doc_id"))
    assert relaid == full


def test_priority_sample_unbiased_subset_sums_over_salts(spark):
    """The DLT theorem: E[sum of max(w, tau) over sampled rows in P] =
    true weight of P, for ANY predicate P. Each salt is an independent
    deterministic draw, so averaging the estimator over salts must
    converge on the truth — checked for the total and for a slice,
    on a HEAVY-TAILED weight set (the regime where naive uniform
    sampling fails and weighted sampling earns its keep)."""
    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        priority_sample,
    )

    rows = [(i, "a" if i % 3 == 0 else "b", (i % 97) + 1 + (10000 if i % 101 == 0 else 0))
            for i in range(600)]
    df = spark.createDataFrame(rows, ["id", "grp", "w"]).cache()
    true_total = sum(w for _, _, w in rows)
    true_a = sum(w for _, g, w in rows if g == "a")
    k, n_salts = 40, 24
    tot_est, a_est = [], []
    for s in range(n_salts):
        samp = priority_sample(df, "w", k, "id", salt=f"s{s}:").collect()
        tot_est.append(sum(r["ps_est"] for r in samp))
        a_est.append(sum(r["ps_est"] for r in samp if r["grp"] == "a"))
    mean_tot = sum(tot_est) / n_salts
    mean_a = sum(a_est) / n_salts
    assert abs(mean_tot - true_total) / true_total < 0.12, (mean_tot, true_total)
    assert abs(mean_a - true_a) / true_a < 0.20, (mean_a, true_a)
    # single-draw sanity: no draw is wildly off (priority sampling's
    # near-optimal variance; a 3x outlier would mean a broken tau)
    assert all(abs(e - true_total) / true_total < 0.9 for e in tot_est), tot_est
    df.unpersist()


def test_priority_sample_small_population_exact_and_guard(spark):
    """n <= k: tau = 0 and every estimate is the exact weight (the
    sample IS the population). Non-positive and NULL weights raise
    in-plan rather than silently biasing the draw."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from accounts_receivable_data_pipeline_api_spark.operators.curation import (
        priority_sample,
    )

    small = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], ["id", "w"])
    out = priority_sample(small, "w", 5, "id").collect()
    assert len(out) == 3
    assert all(r["ps_tau"] == 0.0 and r["ps_est"] == float(r["w"]) for r in out)

    bad = spark.createDataFrame([(1, 10), (2, 0)], ["id", "w"])
    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="positive non-NULL"):
        priority_sample(bad, "w", 2, "id").collect()
    nulls = spark.createDataFrame([(1, 10), (2, None)], ["id", "w"])
    with pytest.raises((SparkRuntimeException, Py4JJavaError), match="positive non-NULL"):
        priority_sample(nulls, "w", 2, "id").collect()


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters — round 11
# ---------------------------------------------------------------------------


def _mg_exact_counts(df, col):
    return {
        r["i"]: r["c"]
        for r in df.groupBy(F.col(col).alias("i"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }


def test_mg_guarantees_on_zipf_under_any_layout(spark):
    """The four Misra-Gries guarantees on a genuinely Zipfian stream
    (rank-r item appears ~60000/r times, far more distinct items than
    counters), under three different partition layouts: estimates
    never exceed truth, undercount stays within the certified
    err_budget, the budget respects N/(k+1), and every item above the
    budget is tracked. The ESTIMATES may differ per layout (any MG's
    do) — the guarantees must not."""
    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        mg_heavy_hitters,
    )

    base = spark.range(1, 300).selectExpr(
        "id AS r", "explode(sequence(1, cast(6000 / id AS INT))) AS copy"
    ).selectExpr("concat('item_', r) AS item")
    k = 16
    for layout in (base.coalesce(1), base.repartition(3), base.repartition(17)):
        exact = _mg_exact_counts(layout, "item")
        n = sum(exact.values())
        rows = mg_heavy_hitters(layout, "item", k).collect()
        assert rows, "summary must not be empty on a skewed stream"
        eb = rows[0]["err_budget"]
        assert all(r["err_budget"] == eb for r in rows)
        assert eb * (k + 1) <= n, (eb, n)
        tracked = {r["item"]: r["est"] for r in rows}
        for item, est in tracked.items():
            t = exact[item]
            assert est <= t, (item, est, t)
            assert t - est <= eb, (item, est, t, eb)
        missing = [i for i, c in exact.items() if c > eb and i not in tracked]
        assert not missing, missing


def test_mg_partials_contract_and_no_truncation_case(spark):
    """mg_partials' NULL-item rows carry exactly the decrement budget
    mg_heavy_hitters reports, and the counter rows sum to its
    estimates. A stream whose vocabulary fits in k counters is EXACT:
    est == true for every item and err_budget == 0."""
    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        mg_heavy_hitters,
        mg_partials,
    )

    small_vocab = spark.range(0, 5000).selectExpr("concat('v', id % 9) AS item")
    exact = _mg_exact_counts(small_vocab, "item")
    rows = mg_heavy_hitters(small_vocab, "item", 16).collect()
    assert {r["item"]: r["est"] for r in rows} == exact
    assert all(r["err_budget"] == 0 for r in rows)

    zipf = spark.range(1, 200).selectExpr(
        "explode(sequence(1, cast(2000 / id AS INT))) AS c", "id"
    ).selectExpr("concat('z', id) AS item").repartition(5)
    parts = mg_partials(zipf, "item", 8).collect()
    dec_total = sum(r["cnt"] for r in parts if r["item"] is None)
    summed = {}
    for r in parts:
        if r["item"] is not None:
            summed[r["item"]] = summed.get(r["item"], 0) + r["cnt"]
    merged = mg_heavy_hitters(zipf, "item", 8).collect()
    assert dec_total == merged[0]["err_budget"]
    assert {r["item"]: r["est"] for r in merged} == summed


def test_mg_all_distinct_keeps_budget_observable(spark):
    """A stream of all-distinct items (every counter truncates away —
    the vocabulary-too-big regime the sketch targets) must NOT return
    an empty frame: the certified error budget stays observable as one
    NULL-item sentinel row, distinguishable from 'no input'
    (round-11 review). The budget still respects (k+1)*budget <= N."""
    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        mg_heavy_hitters,
    )

    k = 8
    distinct = spark.range(0, 50000).selectExpr("concat('u', id) AS item")
    rows = mg_heavy_hitters(distinct, "item", k).collect()
    assert len(rows) == 1
    assert rows[0]["item"] is None and rows[0]["est"] is None
    assert 0 < rows[0]["err_budget"] * (k + 1) <= 50000


def test_hll_time_grain_rollup_composes(spark, sf_dir):
    """Time-grain rollup composability: registers MAX-merge hour->day
    and day->month with the same law, and every grain equals the
    registers computed directly from raw rows at that grain — so a
    hypertable keeps only the finest grain and derives the rest. (The
    corpus entry proves hour->day against DuckDB; this pins the next
    grain and the direct-equality on the Spark side.)"""
    from accounts_receivable_data_pipeline_api_spark.operators.sketch import (
        hll_merge_registers,
        hll_registers,
    )
    from accounts_receivable_data_pipeline_api_spark.sources.star import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("month", F.col("ts")).alias("month"),
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hr"),
    )
    hr_reg = hll_registers(ev, "user_id", m=256, group_cols=("month", "day", "hr"))
    day_roll = hll_merge_registers(hr_reg, group_cols=("month", "day"))
    month_roll = hll_merge_registers(day_roll, group_cols=("month",))

    def key(df, cols):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    day_direct = hll_registers(ev, "user_id", m=256, group_cols=("month", "day"))
    month_direct = hll_registers(ev, "user_id", m=256, group_cols=("month",))
    cols_d = ("month", "day", "bucket", "max_rank")
    cols_m = ("month", "bucket", "max_rank")
    assert key(day_roll, cols_d) == key(day_direct, cols_d)
    assert key(month_roll, cols_m) == key(month_direct, cols_m)
