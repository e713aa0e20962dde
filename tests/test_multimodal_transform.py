"""Byte-level transform kernels (operators/multimodal.py): resize /
decimate / frame-sample must emit VALID format bytes the strict parser
accepts, with the arithmetically-expected features.  Pure Python — no
Spark session needed."""

from __future__ import annotations

from azure_nyctaxi_lambda_elt_spark.operators.multimodal import (
    AUDIO_DECIM,
    FRAME_STRIDE,
    RESIZE_MAX_SIDE,
    _bmp_params,
    _encode_bmp,
    _encode_gif,
    _encode_wav,
    _gif_params,
    _wav_params,
    decode_one,
    transform_one,
)


def test_bmp_resize_dims_and_validity():
    for doc_id in (0, 3, 33, 999, 123456):
        w, h = _bmp_params(doc_id)
        out = decode_one(transform_one(_encode_bmp(doc_id)))
        k = (max(w, h) + RESIZE_MAX_SIDE - 1) // RESIZE_MAX_SIDE
        assert out["width"] == (w + k - 1) // k
        assert out["height"] == (h + k - 1) // k
        assert max(out["width"], out["height"]) <= RESIZE_MAX_SIDE
        assert out["media_type"] == "image"


def test_wav_decimation_preserves_duration():
    for doc_id in (1, 7, 55, 1001):
        ch, sr, n = _wav_params(doc_id)
        out = decode_one(transform_one(_encode_wav(doc_id)))
        assert out["n_frames"] == (n + AUDIO_DECIM - 1) // AUDIO_DECIM
        assert out["sample_rate"] == sr // AUDIO_DECIM
        assert out["n_channels"] == ch
        # duration (frames/rate) is preserved within one frame
        assert abs(out["n_frames"] / out["sample_rate"]
                   - n / sr) <= AUDIO_DECIM / sr


def test_gif_frame_sampling_keeps_every_other():
    for doc_id in (2, 5, 14, 998):
        _w, _h, n_frames, _sub = _gif_params(doc_id)
        out = decode_one(transform_one(_encode_gif(doc_id)))
        assert out["n_frames"] == (n_frames + FRAME_STRIDE - 1) // FRAME_STRIDE
        assert out["media_type"] == "video"


def test_transform_output_reparses_strictly():
    """The re-decode IS the validity proof: every transformed payload
    round-trips through the magic-sniffing struct parser."""
    for doc_id in range(30):
        enc = {0: _encode_bmp, 1: _encode_wav, 2: _encode_gif}[doc_id % 3]
        decode_one(transform_one(enc(doc_id)))  # raises on invalid bytes


# ---------------------------------------------------------------------------
# BPE greedy-merge semantics (operators/bpe.py) — the repeated-token
# edge where naive replace overlaps


def test_bpe_greedy_merge_on_repeats(spark):
    from azure_nyctaxi_lambda_elt_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(0, "a a a"), (1, "a a b"), (2, "b b b b")],
        "doc_id long, text string")
    # batch_k=1: this test pins the SEQUENTIAL per-merge recount
    # semantics (batched rounds recount once per round instead)
    out = {r["merge_rank"]: r
           for r in bpe_train(docs, 2, batch_k=1).collect()}
    # pair counts: (a,a)=3 (docs 0 has 2, doc 1 has 1), (b,b)=3,
    # (a,b)=1 -> tie (a,a) vs (b,b) broken lexicographically to (a,a)
    assert (out[1]["merge_left"], out[1]["merge_right"]) == ("a", "a")
    assert out[1]["pair_count"] == 3
    # greedy application: "a a a" -> "(a+a) a" (non-overlapping), so
    # corpus tokens drop by exactly 2 (one merge in doc0, one in doc1)
    assert out[1]["corpus_tokens_after"] == 10 - 2
    # round 2: (b,b)=3 in "b b b b" -> greedy merges TWO occurrences
    assert (out[2]["merge_left"], out[2]["merge_right"]) == ("b", "b")
    assert out[2]["corpus_tokens_after"] == 8 - 2
