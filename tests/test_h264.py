"""H.264 baseline intra codec (multimodal/h264.py): bitstream layer,
emulation prevention, I_PCM exactness, intra prediction vs an
independent replay, and the CAVLC zero-block nC contexts."""

import numpy as np
import pytest

from nebuia_vector_db_spark.multimodal.h264 import (
    PRED_DC,
    PRED_H,
    PRED_V,
    BitReader,
    BitWriter,
    H264Plan,
    decode_h264,
    encode_h264_iframe,
    split_annexb,
    _ep_insert,
    _ep_remove,
)


def _pcm(seed: int):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(20, 220, size=(16, 16)).astype(np.uint8),
        rng.integers(20, 220, size=(8, 8)).astype(np.uint8),
        rng.integers(20, 220, size=(8, 8)).astype(np.uint8),
    )


def test_exp_golomb_round_trip():
    w = BitWriter()
    ue_vals = [0, 1, 2, 3, 7, 8, 254, 255, 1023]
    se_vals = [0, 1, -1, 2, -2, 26, -26, 127, -128]
    for v in ue_vals:
        w.ue(v)
    for v in se_vals:
        w.se(v)
    w.rbsp_trailing()
    r = BitReader(w.to_rbsp())
    assert [r.ue() for _ in ue_vals] == ue_vals
    assert [r.se() for _ in se_vals] == se_vals


def test_emulation_prevention_round_trip_and_spec_shape():
    payloads = [
        b"\x00\x00\x00",
        b"\x00\x00\x01\x02\x03",
        b"\x00\x00\x02\x00\x00\x03",
        b"\xff\x00\x00\x00\x00\x01",
        bytes(range(256)) * 2,
    ]
    for p in payloads:
        eb = _ep_insert(p)
        # no raw 00 00 00/01/02 survives in the EBSP (00 00 03 may —
        # it IS the escape sequence)
        for i in range(len(eb) - 2):
            assert not (eb[i] == 0 and eb[i + 1] == 0 and eb[i + 2] <= 2), (
                p,
                eb,
            )
        assert _ep_remove(eb) == p


def test_pcm_only_frame_is_pixel_exact():
    mbs = [("pcm", *_pcm(100 + i)) for i in range(6)]
    plan = H264Plan(3, 2, mbs)
    frame = decode_h264(encode_h264_iframe(plan))
    assert frame.sps.width_mbs == 3 and frame.sps.height_mbs == 2
    assert frame.mb_types == ["pcm"] * 6
    for idx, (_, y, cb, cr) in enumerate(mbs):
        mbx, mby = idx % 3, idx // 3
        assert np.array_equal(
            frame.y[mby * 16 : mby * 16 + 16, mbx * 16 : mbx * 16 + 16], y
        )
        assert np.array_equal(
            frame.cb[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8], cb
        )
        assert np.array_equal(
            frame.cr[mby * 8 : mby * 8 + 8, mbx * 8 : mbx * 8 + 8], cr
        )


def test_pcm_zero_runs_force_emulation_prevention():
    """PCM payloads carrying 00 00 01 byte runs MUST be escaped — the
    decoder recovers them exactly and the stream contains the 0x03
    emulation byte; start-code prefixes appear exactly 3 times (SPS,
    PPS, slice)."""
    y = np.zeros((16, 16), dtype=np.uint8)
    y[0, :4] = [0, 0, 1, 0]
    y[5, :6] = [0, 0, 0, 0, 1, 2]
    cb = np.zeros((8, 8), dtype=np.uint8)
    cr = np.full((8, 8), 3, dtype=np.uint8)
    plan = H264Plan(1, 1, [("pcm", y, cb, cr)])
    data = encode_h264_iframe(plan)
    assert data.count(b"\x00\x00\x01") == 3  # start codes only
    assert b"\x00\x00\x03" in data  # emulation byte present
    frame = decode_h264(data)
    assert np.array_equal(frame.y, y)
    assert np.array_equal(frame.cb, cb)
    assert np.array_equal(frame.cr, cr)


def test_vertical_prediction_extends_pcm_rows():
    """Row 0 PCM, rows below I_16x16 vertical: every predicted column
    carries the PCM macroblock's bottom-row value — checked against an
    independent numpy replay (and the nC >= 8 FLC coeff_token context
    is exercised because the top neighbors are I_PCM)."""
    w_mbs, h_mbs = 3, 3
    pcm_row = [("pcm", *_pcm(7 + i)) for i in range(w_mbs)]
    mbs = pcm_row + [("i16", PRED_V)] * (w_mbs * (h_mbs - 1))
    frame = decode_h264(encode_h264_iframe(H264Plan(w_mbs, h_mbs, mbs)))
    # replay: luma rows 16.. repeat row 15; chroma below is DC-predicted
    want = frame.y[:16].copy()
    expect = np.vstack(
        [want] + [np.repeat(want[15][None, :], 16, axis=0)] * (h_mbs - 1)
    )
    assert np.array_equal(frame.y, expect)
    assert frame.mb_types[:w_mbs] == ["pcm"] * w_mbs
    assert set(frame.mb_types[w_mbs:]) == {"i16_v"}


def test_horizontal_prediction_extends_pcm_columns():
    w_mbs, h_mbs = 3, 2
    mbs = []
    for mby in range(h_mbs):
        mbs.append(("pcm", *_pcm(50 + mby)))
        mbs.extend([("i16", PRED_H)] * (w_mbs - 1))
    frame = decode_h264(encode_h264_iframe(H264Plan(w_mbs, h_mbs, mbs)))
    left = frame.y[:, :16]
    expect = np.hstack(
        [left]
        + [np.repeat(left[:, 15][:, None], 16, axis=1)] * (w_mbs - 1)
    )
    assert np.array_equal(frame.y, expect)


def test_dc_prediction_modes():
    # lone DC mb: no neighbors -> 128 everywhere (luma and chroma)
    frame = decode_h264(
        encode_h264_iframe(H264Plan(1, 1, [("i16", PRED_DC)]))
    )
    assert np.all(frame.y == 128)
    assert np.all(frame.cb == 128) and np.all(frame.cr == 128)
    # PCM left + DC right: DC = mean of left mb's right column (top
    # unavailable) per 8.3.3.3
    pcm = _pcm(9)
    frame = decode_h264(
        encode_h264_iframe(
            H264Plan(2, 1, [("pcm", *pcm), ("i16", PRED_DC)])
        )
    )
    left_col = pcm[0][:, 15].astype(np.int64)
    want_dc = (int(left_col.sum()) + 8) >> 4
    assert np.all(frame.y[:, 16:] == want_dc)


def test_mixed_plan_deterministic_and_parseable_nals():
    mbs = [("pcm", *_pcm(1)), ("i16", PRED_H), ("pcm", *_pcm(2)),
           ("i16", PRED_V), ("i16", PRED_V), ("i16", PRED_V)]
    plan = H264Plan(3, 2, mbs)
    a, b = encode_h264_iframe(plan), encode_h264_iframe(plan)
    assert a == b
    nals = split_annexb(a)
    assert [n[0] & 0x1F for n in nals] == [7, 8, 5]
    fa, fb = decode_h264(a), decode_h264(b)
    assert np.array_equal(fa.y, fb.y)


def test_unsupported_features_raise_cleanly():
    with pytest.raises(NotImplementedError):
        # I_16x16 with luma residual (mb_type 13) is out of scope
        from nebuia_vector_db_spark.multimodal.h264 import (
            _build_pps,
            _build_sps,
            _nal,
            BitWriter,
            SPS,
        )

        w = BitWriter()
        w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
        w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
        w.ue(13)  # I_16x16 with CBP luma 15
        w.rbsp_trailing()
        data = (
            _nal(3, 7, _build_sps(SPS(1, 1)))
            + _nal(3, 8, _build_pps())
            + _nal(3, 5, w.to_rbsp())
        )
        decode_h264(data)
    with pytest.raises(ValueError):
        decode_h264(b"\x00\x00\x00\x01\x65\x88")  # slice before SPS


def test_coeff_token_zero_table_9_5_bit_exact():
    """ADVICE r9: the 4<=nC<8 context must use Table 9-5's 4-bit VLC
    1111 for TotalCoeff=0 (the old code wrote the 6-bit FLC there —
    unreachable from this encoder but wrong for external streams).
    Pin the written bit pattern and the write→read round trip for
    every nC context class."""
    from nebuia_vector_db_spark.multimodal.h264 import (
        BitReader,
        BitWriter,
        _read_coeff_token_zero,
        _write_coeff_token_zero,
    )

    want_bits = {0: "1", 1: "1", 2: "11", 3: "11", 4: "1111",
                 7: "1111", 8: "000011", 16: "000011"}
    for n_c, bits in want_bits.items():
        w = BitWriter()
        _write_coeff_token_zero(w, n_c)
        w.align_zero()
        data = w.to_rbsp()
        got = "".join(f"{b:08b}" for b in data)[: len(bits)]
        assert got == bits, (n_c, got, bits)
        r = BitReader(data)
        _read_coeff_token_zero(r, n_c)  # must not raise
