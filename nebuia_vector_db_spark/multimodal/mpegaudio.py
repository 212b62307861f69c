"""Pure-Python MPEG-1 Audio Layer II (MP2) codec — the first REAL
lossy perceptual codec behind the multimodal surface (round 7,
VERDICT r6 task #8; the reference engine, main.go:25-75, is
text+vector only — this whole module is the mandated multimodal
extension).

Layer II is the deployed broadcast codec (DAB radio, DVB television
audio) and shares its entire subband architecture — 32-band pseudo-QMF
analysis, scalefactored block-companded quantization, grouped codes —
with Layer III ("MP3"), minus the MDCT/Huffman stage. Everything here
is implemented from the public ISO/IEC 11172-3 specification:

- **Frame header** (§2.4.1.3): 11-bit sync, version/layer/protection,
  bitrate + sample-rate indices, padding, mode.
- **Bit allocation, Table B.2a** (the 44.1/48 kHz high-rate table,
  sblimit = 27): per-subband quantizer-class ladders, 4/4/3/2
  allocation bits by subband group.
- **scfsi + scalefactors** (§2.4.2.4): 2-bit scalefactor-selection
  information per coded subband chooses how many of the three
  12-sample parts share a transmitted 6-bit scalefactor index
  (patterns 0: three, 1: {0,1}+{2}, 2: one for all, 3: {0}+{1,2}).
- **Sample codes**: 12 granules x 3 samples per subband; classes with
  3/5/9 steps are GROUPED — one base-L^3 code in 5/7/10 bits carries
  three samples (lowest digit = first sample); all other classes send
  nbits-per-sample plain codes, with the all-ones code forbidden
  (L = 2^nbits - 1 levels).
- **Requantization**: code v in [0, L) reconstructs to
  ``scf * (2v + 1 - L) / L`` — the uniform midtread grid. This closed
  form is EXACTLY the spec's ``s = C * (s''' + D)`` table: matching
  slope and offset gives C = 2^nbits/L and D = (2^nbits + 1 - L) /
  2^nbits, which reproduces the published constants for every class
  (e.g. L=3: C=4/3, D=1/2; L=5: C=8/5, D=1/2; L=7: C=8/7, D=1/4;
  L=9: C=16/9, D=1/2; L=15: C=16/15, D=1/8). Derivation pinned in
  tests/test_mpegaudio.py.
- **Scalefactors** (Table B.1): scf[i] = 2.0 * 2^(-i/3), i = 0..62.

DOCUMENTED DEVIATION (filterbank window): the ISO synthesis window
(Table B.3, 512 coefficients) is a tabulated prototype with no closed
form, and this repo embeds no copied tables. The analysis/synthesis
filterbanks here use the spec's odd-stacked 32-band cosine modulation
((pi/32)(k + 1/2) band spacing — the same subband geometry as
Table C.1's matrixing) over a 512-tap near-perfect-reconstruction
prototype DESIGNED in-repo (tools/design_qmf_prototype.py: Adam-
optimized power complementarity + stopband energy; measured
round-trip SNR ~71-88 dB, stopband ~-61 dB). Reconstruction is
near-perfect but not bit-identical to an ISO-window decoder. The
BITSTREAM layer — everything hash-checked by the `mm_mp2_audio`
registry row — is exact per the spec.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


class Mp2FormatError(ValueError):
    """Raised when a payload is not a decodable Layer II stream."""


# ---------------------------------------------------------------- constants
BITRATES_KBPS = (
    None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384
)
SAMPLE_RATES = (44100, 48000, 32000)
SAMPLES_PER_FRAME = 1152
SBLIMIT = 27  # Table B.2a

# Table B.2a quantizer-class ladders (steps per class; 0 = not coded)
_ALLOC_LOW = (  # subbands 0-2, 4 allocation bits
    0, 3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
    16383, 32767, 65535,
)
_ALLOC_MID = (  # subbands 3-10, 4 allocation bits
    0, 3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
    8191, 65535,
)
_ALLOC_HIGH = (0, 3, 5, 7, 9, 15, 31, 65535)  # subbands 11-22, 3 bits
_ALLOC_TOP = (0, 3, 5, 65535)  # subbands 23-26, 2 bits


def alloc_table(sb: int) -> tuple[int, tuple[int, ...]]:
    """(allocation_bits, steps_ladder) for subband ``sb`` (B.2a)."""
    if sb < 3:
        return 4, _ALLOC_LOW
    if sb < 11:
        return 4, _ALLOC_MID
    if sb < 23:
        return 3, _ALLOC_HIGH
    if sb < SBLIMIT:
        return 2, _ALLOC_TOP
    raise Mp2FormatError(f"subband {sb} beyond sblimit {SBLIMIT}")


# grouped classes: steps -> bits per 3-sample group
_GROUP_BITS = {3: 5, 5: 7, 9: 10}


def _sample_bits(steps: int) -> int:
    """Bits per UNGROUPED sample code: steps = 2^n - 1 -> n."""
    n = steps.bit_length()
    if (1 << n) - 1 != steps:
        raise Mp2FormatError(f"non-power-ladder steps {steps} ungrouped")
    return n


SCALEFACTORS = tuple(2.0 * 2.0 ** (-i / 3.0) for i in range(63))


def dequantize(v: int, steps: int, scf_idx: int) -> float:
    """Reconstruction grid: scf * (2v + 1 - L) / L (see module doc)."""
    return SCALEFACTORS[scf_idx] * (2 * v + 1 - steps) / steps


# ----------------------------------------------------------------- bit I/O
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def pad_to(self, nbytes: int) -> None:
        if self._n:
            self.write(0, 8 - self._n)
        if len(self.out) > nbytes:
            raise Mp2FormatError(
                f"frame overflow: {len(self.out)} > {nbytes} bytes"
            )
        self.out.extend(b"\x00" * (nbytes - len(self.out)))


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read(self, length: int) -> int:
        while self._n < length:
            if self.pos >= len(self.data):
                raise Mp2FormatError("bitstream truncated")
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._n += 8
        self._n -= length
        v = (self._acc >> self._n) & ((1 << length) - 1)
        self._acc &= (1 << self._n) - 1
        return v


# ----------------------------------------------------------------- frames
@dataclass
class Mp2Frame:
    """One decoded (or to-be-encoded) mono Layer II frame: the
    bitstream-layer content, exact integers throughout."""

    bitrate_kbps: int
    sample_rate: int
    allocation: list[int]  # per subband: steps (0 = not coded)
    scfsi: list[int]  # per CODED subband position, 2-bit pattern
    scf_idx: list[list[int]]  # per coded subband: 3 per-part indices
    codes: list[list[int]]  # per coded subband: 36 sample codes
    padding: int = 0
    # float subband samples (dequantized), filled by decode
    samples: np.ndarray | None = field(default=None, repr=False)


def frame_bytes(bitrate_kbps: int, sample_rate: int, padding: int = 0) -> int:
    return 144 * bitrate_kbps * 1000 // sample_rate + padding


def _scf_transmitted(scfsi: int, scf3: list[int]) -> list[int]:
    """Which of the three per-part indices go on the wire (§2.4.2.4)."""
    if scfsi == 0:
        return [scf3[0], scf3[1], scf3[2]]
    if scfsi == 1:
        return [scf3[0], scf3[2]]  # parts {0,1} share, {2} own
    if scfsi == 2:
        return [scf3[0]]  # all three share
    return [scf3[0], scf3[1]]  # 3: {0} own, {1,2} share


def _scf_expand(scfsi: int, sent: list[int]) -> list[int]:
    if scfsi == 0:
        return [sent[0], sent[1], sent[2]]
    if scfsi == 1:
        return [sent[0], sent[0], sent[1]]
    if scfsi == 2:
        return [sent[0], sent[0], sent[0]]
    return [sent[0], sent[1], sent[1]]


def encode_mp2_frame(frame: Mp2Frame) -> bytes:
    """Pack one mono Layer II frame (no CRC) per ISO 11172-3 §2.4.1."""
    if frame.sample_rate not in SAMPLE_RATES:
        raise Mp2FormatError(f"unsupported sample rate {frame.sample_rate}")
    if frame.bitrate_kbps not in BITRATES_KBPS[1:]:
        raise Mp2FormatError(f"unsupported bitrate {frame.bitrate_kbps}")
    if len(frame.allocation) != SBLIMIT:
        raise Mp2FormatError("allocation must cover all 27 subbands")
    w = _BitWriter()
    # header: sync(11) ver(2)=11 layer(2)=10 prot(1)=1 bitrate(4)
    # srate(2) pad(1) priv(1) mode(2)=11(mono) ext(2) copy(1) orig(1)
    # emphasis(2)
    w.write(0x7FF, 11)
    w.write(0b11, 2)
    w.write(0b10, 2)
    w.write(1, 1)
    w.write(BITRATES_KBPS.index(frame.bitrate_kbps), 4)
    w.write(SAMPLE_RATES.index(frame.sample_rate), 2)
    w.write(frame.padding, 1)
    w.write(0, 1)
    w.write(0b11, 2)
    w.write(0, 2)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 2)
    # allocation
    coded = []
    for sb, steps in enumerate(frame.allocation):
        bits, ladder = alloc_table(sb)
        try:
            idx = ladder.index(steps)
        except ValueError:
            raise Mp2FormatError(
                f"steps {steps} not in subband {sb}'s ladder"
            ) from None
        w.write(idx, bits)
        if steps:
            coded.append(sb)
    if len(frame.scfsi) != len(coded) or len(frame.scf_idx) != len(coded):
        raise Mp2FormatError("scfsi/scf_idx must match coded subbands")
    if len(frame.codes) != len(coded) or any(
        len(c) != 36 for c in frame.codes
    ) or any(len(s3) != 3 for s3 in frame.scf_idx):
        raise Mp2FormatError(
            "codes must be 36 samples per coded subband and scf_idx "
            "3 per-part indices — a short list would silently "
            "under-pack the frame and shift every later field"
        )
    # scfsi
    for pos in range(len(coded)):
        w.write(frame.scfsi[pos], 2)
    # scalefactors
    for pos in range(len(coded)):
        for idx in _scf_transmitted(frame.scfsi[pos], frame.scf_idx[pos]):
            if not 0 <= idx < 63:
                raise Mp2FormatError(f"scalefactor index {idx} out of range")
            w.write(idx, 6)
    # samples: 12 granules x (3 samples per coded subband)
    for gr in range(12):
        for pos, sb in enumerate(coded):
            steps = frame.allocation[sb]
            v = frame.codes[pos][3 * gr : 3 * gr + 3]
            if any(not 0 <= x < steps for x in v):
                raise Mp2FormatError(f"code out of range for {steps} steps")
            if steps in _GROUP_BITS:
                w.write(
                    v[0] + steps * v[1] + steps * steps * v[2],
                    _GROUP_BITS[steps],
                )
            else:
                nb = _sample_bits(steps)
                for x in v:
                    w.write(x, nb)
    w.pad_to(frame_bytes(frame.bitrate_kbps, frame.sample_rate, frame.padding))
    return bytes(w.out)


def decode_mp2_frame(data: bytes) -> tuple[Mp2Frame, int]:
    """Decode one mono Layer II frame starting at ``data[0]``.
    Returns (frame, consumed_bytes); ``frame.samples`` holds the
    (36, 32) dequantized float subband samples."""
    r = _BitReader(data)
    if r.read(11) != 0x7FF:
        raise Mp2FormatError("bad sync word")
    if r.read(2) != 0b11:
        raise Mp2FormatError("not MPEG-1")
    if r.read(2) != 0b10:
        raise Mp2FormatError("not Layer II")
    if r.read(1) != 1:
        raise Mp2FormatError("CRC-protected streams not supported")
    br_idx = r.read(4)
    if not 1 <= br_idx <= 14:
        raise Mp2FormatError(f"bad bitrate index {br_idx}")
    sr_idx = r.read(2)
    if sr_idx > 2:
        raise Mp2FormatError(f"bad sample-rate index {sr_idx}")
    padding = r.read(1)
    r.read(1)  # private
    if r.read(2) != 0b11:
        raise Mp2FormatError("only single_channel mode supported")
    r.read(2)
    r.read(1)
    r.read(1)
    r.read(2)
    bitrate = BITRATES_KBPS[br_idx]
    sample_rate = SAMPLE_RATES[sr_idx]
    nbytes = frame_bytes(bitrate, sample_rate, padding)
    if len(data) < nbytes:
        raise Mp2FormatError("frame truncated")
    allocation = []
    coded = []
    for sb in range(SBLIMIT):
        bits, ladder = alloc_table(sb)
        steps = ladder[r.read(bits)]
        allocation.append(steps)
        if steps:
            coded.append(sb)
    scfsi = [r.read(2) for _ in coded]
    scf_idx = []
    for pos in range(len(coded)):
        n_sent = len(_scf_transmitted(scfsi[pos], [0, 0, 0]))
        sent = []
        for _ in range(n_sent):
            idx = r.read(6)
            if idx >= 63:
                raise Mp2FormatError(f"scalefactor index {idx} out of range")
            sent.append(idx)
        scf_idx.append(_scf_expand(scfsi[pos], sent))
    codes: list[list[int]] = [[0] * 36 for _ in coded]
    for gr in range(12):
        for pos, sb in enumerate(coded):
            steps = allocation[sb]
            if steps in _GROUP_BITS:
                g = r.read(_GROUP_BITS[steps])
                v = [g % steps, (g // steps) % steps, g // (steps * steps)]
                if v[2] >= steps:
                    raise Mp2FormatError(
                        f"group code {g} out of range for {steps} steps"
                    )
            else:
                nb = _sample_bits(steps)
                v = [r.read(nb) for _ in range(3)]
                if any(x >= steps for x in v):
                    raise Mp2FormatError(
                        f"forbidden all-ones code for {steps} steps"
                    )
            for j in range(3):
                codes[pos][3 * gr + j] = v[j]
    if r.pos > nbytes:
        raise Mp2FormatError("frame payload overran its byte budget")
    samples = np.zeros((36, 32), dtype=np.float64)
    for pos, sb in enumerate(coded):
        steps = allocation[sb]
        for s in range(36):
            part = s // 12
            samples[s, sb] = dequantize(
                codes[pos][s], steps, scf_idx[pos][part]
            )
    frame = Mp2Frame(
        bitrate_kbps=bitrate,
        sample_rate=sample_rate,
        allocation=allocation,
        scfsi=scfsi,
        scf_idx=scf_idx,
        codes=codes,
        padding=padding,
        samples=samples,
    )
    return frame, nbytes


def encode_mp2(frames: list[Mp2Frame]) -> bytes:
    return b"".join(encode_mp2_frame(f) for f in frames)


def decode_mp2(data: bytes) -> list[Mp2Frame]:
    """Decode a whole mono Layer II stream (frame-concatenated)."""
    out = []
    off = 0
    while off < len(data):
        frame, used = decode_mp2_frame(data[off:])
        out.append(frame)
        off += used
    return out


# ------------------------------------------------- pseudo-QMF filterbank
# 512-tap near-perfect-reconstruction prototype, DESIGNED (not copied)
# by tools/design_qmf_prototype.py: Adam-optimized for power
# complementarity across band crossovers + stopband energy (the
# property the ISO Table B.3 window provides and a windowed sinc
# lacks). Measured: round-trip SNR ~71 dB, stopband ~-61 dB,
# composite gain 32.000239 (normalized by exactly 32 below).
# generated by tools/design_qmf_prototype.py
_PROTO_COEFFS = (
    -1.32324318851263367e-05, -1.30469155369176746e-05, -1.27175948029918370e-05, -1.22445576555640942e-05,
    -1.16299404939319011e-05, -1.08780234390334797e-05, -9.99530423375922299e-06, -8.99054881806722519e-06,
    -7.87481682518577541e-06, -6.66146045066103466e-06, -5.36609538239135012e-06, -4.00654274431454456e-06,
    -2.60274130310778588e-06, -1.17662951882021188e-06, 2.48002616808505823e-07, 1.64569163235847420e-06,
    2.98950782104699828e-06, 4.25129060302679352e-06, 5.40191056318481856e-06, 6.41155635927412478e-06,
    7.25004433298792960e-06, 7.88714828709527912e-06, 8.29294652288710844e-06, 8.43818288155932720e-06,
    8.29463823187132971e-06, 7.83550862501475112e-06, 7.03578620842512032e-06, 5.87263882825570499e-06,
    4.32578382498784786e-06, 2.37785181737562454e-06, 1.47351031020129762e-08, -2.77408371428734983e-06,
    -5.99522637468141001e-06, -9.65114109487003498e-06, -1.37398564231687107e-05, -1.82547727833543251e-05,
    -2.31844967796866997e-05, -2.85127214110013752e-05, -3.42181543255109242e-05, -4.02744964801258720e-05,
    -4.66504740852268480e-05, -5.33099266360374132e-05, -6.02119531144569705e-05, -6.73111175139404525e-05,
    -7.45577140328633378e-05, -8.18980916413692512e-05, -8.92750371588225294e-05, -9.66282153907715812e-05,
    -1.03894664230625491e-04, -1.11009341954024796e-04, -1.17905723241226731e-04, -1.24516439783392508e-04,
    -1.30773960667765542e-04, -1.36611307106454820e-04, -1.41962795474505419e-04, -1.46764802064929683e-04,
    -1.50956542454712520e-04, -1.54480857917235894e-04, -1.57285000915168070e-04, -1.59321411375759847e-04,
    -1.60548475185409869e-04, -1.60931256154269733e-04, -1.60442192594402293e-04, -1.59061749634082863e-04,
    -1.56779018460535358e-04, -1.53592253847290115e-04, -1.49509341582029082e-04, -1.44548187769167117e-04,
    -1.38737022434869361e-04, -1.32114610411574330e-04, -1.24730363118451195e-04, -1.16644345581810798e-04,
    -1.07927173849227710e-04, -9.86597988401488070e-05, -8.89331736407730084e-05, -7.88478022871789920e-05,
    -6.85131691815931727e-05, -5.80470494447676179e-05, -4.75747017036143448e-05, -3.72279460334428011e-05,
    -2.71441309948623908e-05, -1.74649949159456301e-05, -8.33542776353522643e-06, 9.78588642727173048e-08,
    7.68774489554568489e-06, 1.42881881441880964e-05, 1.97557726944847545e-05, 2.39513069331728728e-05,
    2.67414577403810743e-05, 2.80004062853202872e-05, 2.76115103096546377e-05, 2.54689661095870457e-05,
    2.14794503353283225e-05, 1.55637102830261105e-05, 7.65810277736075283e-06, -2.28393986096227900e-06,
    -1.42905332798900147e-05, -2.83700706789077925e-05, -4.45100746277297558e-05, -6.26761867096346857e-05,
    -8.28113100028372471e-05, -1.04834918741264876e-04, -1.28642548649215163e-04, -1.54105466806020138e-04,
    -1.81070564917691618e-04, -2.09360504348853738e-04, -2.38773987778131925e-04, -2.69086333914064508e-04,
    -3.00050261408279140e-04, -3.31396911920610175e-04, -3.62837110633969131e-04, -3.94062862503067755e-04,
    -4.24749080675683726e-04, -4.54555541410062440e-04, -4.83129057682399495e-04, -5.10105861570737344e-04,
    -5.35114183377658164e-04, -5.57777013296260004e-04, -5.77715029269210232e-04, -5.94549672617201075e-04,
    -6.07906351059342149e-04, -6.17417746924688537e-04, -6.22727206657463172e-04, -6.23492186172534758e-04,
    -6.19387725245599575e-04, -6.10109922957057416e-04, -5.95379385268073351e-04, -5.74944615096462455e-04,
    -5.48585314777112450e-04, -5.16115570517827467e-04, -4.77386888383324640e-04, -4.32291051450523595e-04,
    -3.80762768084857907e-04, -3.22782081820929562e-04, -2.58376514128106131e-04, -1.87622912448289072e-04,
    -1.10648977333301096e-04, -2.76344442947652409e-05, 6.11881019098976190e-05, 1.55532800424942094e-04,
    2.55060492088146856e-04, 3.59379116203305824e-04, 4.68044537574068844e-04, 5.80561811872675805e-04,
    6.96386894092113290e-04, 8.14928791441319085e-04, 9.35552158661498521e-04, 1.05758033046466455e-03,
    1.18029878271241656e-03, 1.30295901116111762e-03, 1.42478281431849575e-03, 1.54496696575413708e-03,
    1.66268826175267385e-03, 1.77710893148904986e-03, 1.88738239396351540e-03, 1.99265932680660774e-03,
    2.09209389293603734e-03, 2.18484965614813408e-03, 2.27010591461563162e-03, 2.34706539538613894e-03,
    2.41496042483584517e-03, 2.47305970534552775e-03, 2.52067496658182682e-03, 2.55716752493727979e-03,
    2.58195471333144038e-03, 2.59451614305795898e-03, 2.59439975293836557e-03, 2.58122759419360378e-03,
    2.55470129514756734e-03, 2.51460714917055945e-03, 2.46082077149975716e-03, 2.39331127445830110e-03,
    2.31214491512487076e-03, 2.21748817417802453e-03, 2.10961022930674768e-03, 1.98888479114004606e-03,
    1.85579127377684676e-03, 1.71091527515212084e-03, 1.55494835904027018e-03, 1.38868702102602532e-03,
    1.21303093095147187e-03, 1.02898071271692029e-03, 8.37634634934998862e-04, 6.40184608171979271e-04,
    4.37911475282188635e-04, 2.32179600147948645e-04, 2.44308005494655599e-05, -1.83822388828877478e-04,
    -3.91004172998778903e-04, -5.95483608477557786e-04, -7.95583215398528972e-04, -9.89588029482431917e-04,
    -1.17575513586882325e-03, -1.35232368254145511e-03, -1.51752528623932915e-03, -1.66959473084680792e-03,
    -1.80678088965439488e-03, -1.92735782032437482e-03, -2.02963597550295674e-03, -2.11197345964294443e-03,
    -2.17278725464618502e-03, -2.21056433417614545e-03, -2.22387258649857410e-03, -2.21137146685802853e-03,
    -2.17182230217869213e-03, -2.10409817321108132e-03, -2.00719330208260762e-03, -1.88023187647608724e-03,
    -1.72247624529376243e-03, -1.53333442465970011e-03, -1.31236685750096859e-03, -1.05929237477998860e-03,
    -7.73993311753654522e-04, -4.56519738358159997e-04, -1.07092768603090364e-04, 2.73893081477495041e-04,
    6.85868515172001697e-04, 1.12808906626029487e-03, 1.59963559906173367e-03, 2.09941557188831653e-03,
    2.62616561349466454e-03, 3.17845427870733525e-03, 3.75469062738092172e-03, 4.35312595161908931e-03,
    4.97187212099586221e-03, 5.60891257649441186e-03, 6.26209426396980105e-03, 6.92914020791169163e-03,
    7.60766227938271689e-03, 8.29517271092427080e-03, 8.98909591905694069e-03, 9.68678160758462518e-03,
    1.03855181722636962e-02, 1.10825464820603747e-02, 1.17750740913185395e-02, 1.24602898001201102e-02,
    1.31353784523954679e-02, 1.37975358681398496e-02, 1.44439838134705015e-02, 1.50719849161206083e-02,
    1.56788574359714231e-02, 1.62619898017110284e-02, 1.68188548263686621e-02, 1.73470235167157566e-02,
    1.78441783946297269e-02, 1.83081262526220701e-02, 1.87368102707396282e-02, 1.91283214275574341e-02,
    1.94809091433072040e-02, 1.97929910975159079e-02, 2.00631621661799264e-02, 2.02902024242060663e-02,
    2.04730841579701429e-02, 2.06109778314294487e-02, 2.07032569488866218e-02, 2.07495017600585439e-02,
    2.07495017600585439e-02, 2.07032569488866218e-02, 2.06109778314294487e-02, 2.04730841579701429e-02,
    2.02902024242060663e-02, 2.00631621661799264e-02, 1.97929910975159079e-02, 1.94809091433072040e-02,
    1.91283214275574341e-02, 1.87368102707396282e-02, 1.83081262526220701e-02, 1.78441783946297269e-02,
    1.73470235167157566e-02, 1.68188548263686621e-02, 1.62619898017110284e-02, 1.56788574359714231e-02,
    1.50719849161206083e-02, 1.44439838134705015e-02, 1.37975358681398496e-02, 1.31353784523954679e-02,
    1.24602898001201102e-02, 1.17750740913185395e-02, 1.10825464820603747e-02, 1.03855181722636962e-02,
    9.68678160758462518e-03, 8.98909591905694069e-03, 8.29517271092427080e-03, 7.60766227938271689e-03,
    6.92914020791169163e-03, 6.26209426396980105e-03, 5.60891257649441186e-03, 4.97187212099586221e-03,
    4.35312595161908931e-03, 3.75469062738092172e-03, 3.17845427870733525e-03, 2.62616561349466454e-03,
    2.09941557188831653e-03, 1.59963559906173367e-03, 1.12808906626029487e-03, 6.85868515172001697e-04,
    2.73893081477495041e-04, -1.07092768603090364e-04, -4.56519738358159997e-04, -7.73993311753654522e-04,
    -1.05929237477998860e-03, -1.31236685750096859e-03, -1.53333442465970011e-03, -1.72247624529376243e-03,
    -1.88023187647608724e-03, -2.00719330208260762e-03, -2.10409817321108132e-03, -2.17182230217869213e-03,
    -2.21137146685802853e-03, -2.22387258649857410e-03, -2.21056433417614545e-03, -2.17278725464618502e-03,
    -2.11197345964294443e-03, -2.02963597550295674e-03, -1.92735782032437482e-03, -1.80678088965439488e-03,
    -1.66959473084680792e-03, -1.51752528623932915e-03, -1.35232368254145511e-03, -1.17575513586882325e-03,
    -9.89588029482431917e-04, -7.95583215398528972e-04, -5.95483608477557786e-04, -3.91004172998778903e-04,
    -1.83822388828877478e-04, 2.44308005494655599e-05, 2.32179600147948645e-04, 4.37911475282188635e-04,
    6.40184608171979271e-04, 8.37634634934998862e-04, 1.02898071271692029e-03, 1.21303093095147187e-03,
    1.38868702102602532e-03, 1.55494835904027018e-03, 1.71091527515212084e-03, 1.85579127377684676e-03,
    1.98888479114004606e-03, 2.10961022930674768e-03, 2.21748817417802453e-03, 2.31214491512487076e-03,
    2.39331127445830110e-03, 2.46082077149975716e-03, 2.51460714917055945e-03, 2.55470129514756734e-03,
    2.58122759419360378e-03, 2.59439975293836557e-03, 2.59451614305795898e-03, 2.58195471333144038e-03,
    2.55716752493727979e-03, 2.52067496658182682e-03, 2.47305970534552775e-03, 2.41496042483584517e-03,
    2.34706539538613894e-03, 2.27010591461563162e-03, 2.18484965614813408e-03, 2.09209389293603734e-03,
    1.99265932680660774e-03, 1.88738239396351540e-03, 1.77710893148904986e-03, 1.66268826175267385e-03,
    1.54496696575413708e-03, 1.42478281431849575e-03, 1.30295901116111762e-03, 1.18029878271241656e-03,
    1.05758033046466455e-03, 9.35552158661498521e-04, 8.14928791441319085e-04, 6.96386894092113290e-04,
    5.80561811872675805e-04, 4.68044537574068844e-04, 3.59379116203305824e-04, 2.55060492088146856e-04,
    1.55532800424942094e-04, 6.11881019098976190e-05, -2.76344442947652409e-05, -1.10648977333301096e-04,
    -1.87622912448289072e-04, -2.58376514128106131e-04, -3.22782081820929562e-04, -3.80762768084857907e-04,
    -4.32291051450523595e-04, -4.77386888383324640e-04, -5.16115570517827467e-04, -5.48585314777112450e-04,
    -5.74944615096462455e-04, -5.95379385268073351e-04, -6.10109922957057416e-04, -6.19387725245599575e-04,
    -6.23492186172534758e-04, -6.22727206657463172e-04, -6.17417746924688537e-04, -6.07906351059342149e-04,
    -5.94549672617201075e-04, -5.77715029269210232e-04, -5.57777013296260004e-04, -5.35114183377658164e-04,
    -5.10105861570737344e-04, -4.83129057682399495e-04, -4.54555541410062440e-04, -4.24749080675683726e-04,
    -3.94062862503067755e-04, -3.62837110633969131e-04, -3.31396911920610175e-04, -3.00050261408279140e-04,
    -2.69086333914064508e-04, -2.38773987778131925e-04, -2.09360504348853738e-04, -1.81070564917691618e-04,
    -1.54105466806020138e-04, -1.28642548649215163e-04, -1.04834918741264876e-04, -8.28113100028372471e-05,
    -6.26761867096346857e-05, -4.45100746277297558e-05, -2.83700706789077925e-05, -1.42905332798900147e-05,
    -2.28393986096227900e-06, 7.65810277736075283e-06, 1.55637102830261105e-05, 2.14794503353283225e-05,
    2.54689661095870457e-05, 2.76115103096546377e-05, 2.80004062853202872e-05, 2.67414577403810743e-05,
    2.39513069331728728e-05, 1.97557726944847545e-05, 1.42881881441880964e-05, 7.68774489554568489e-06,
    9.78588642727173048e-08, -8.33542776353522643e-06, -1.74649949159456301e-05, -2.71441309948623908e-05,
    -3.72279460334428011e-05, -4.75747017036143448e-05, -5.80470494447676179e-05, -6.85131691815931727e-05,
    -7.88478022871789920e-05, -8.89331736407730084e-05, -9.86597988401488070e-05, -1.07927173849227710e-04,
    -1.16644345581810798e-04, -1.24730363118451195e-04, -1.32114610411574330e-04, -1.38737022434869361e-04,
    -1.44548187769167117e-04, -1.49509341582029082e-04, -1.53592253847290115e-04, -1.56779018460535358e-04,
    -1.59061749634082863e-04, -1.60442192594402293e-04, -1.60931256154269733e-04, -1.60548475185409869e-04,
    -1.59321411375759847e-04, -1.57285000915168070e-04, -1.54480857917235894e-04, -1.50956542454712520e-04,
    -1.46764802064929683e-04, -1.41962795474505419e-04, -1.36611307106454820e-04, -1.30773960667765542e-04,
    -1.24516439783392508e-04, -1.17905723241226731e-04, -1.11009341954024796e-04, -1.03894664230625491e-04,
    -9.66282153907715812e-05, -8.92750371588225294e-05, -8.18980916413692512e-05, -7.45577140328633378e-05,
    -6.73111175139404525e-05, -6.02119531144569705e-05, -5.33099266360374132e-05, -4.66504740852268480e-05,
    -4.02744964801258720e-05, -3.42181543255109242e-05, -2.85127214110013752e-05, -2.31844967796866997e-05,
    -1.82547727833543251e-05, -1.37398564231687107e-05, -9.65114109487003498e-06, -5.99522637468141001e-06,
    -2.77408371428734983e-06, 1.47351031020129762e-08, 2.37785181737562454e-06, 4.32578382498784786e-06,
    5.87263882825570499e-06, 7.03578620842512032e-06, 7.83550862501475112e-06, 8.29463823187132971e-06,
    8.43818288155932720e-06, 8.29294652288710844e-06, 7.88714828709527912e-06, 7.25004433298792960e-06,
    6.41155635927412478e-06, 5.40191056318481856e-06, 4.25129060302679352e-06, 2.98950782104699828e-06,
    1.64569163235847420e-06, 2.48002616808505823e-07, -1.17662951882021188e-06, -2.60274130310778588e-06,
    -4.00654274431454456e-06, -5.36609538239135012e-06, -6.66146045066103466e-06, -7.87481682518577541e-06,
    -8.99054881806722519e-06, -9.99530423375922299e-06, -1.08780234390334797e-05, -1.16299404939319011e-05,
    -1.22445576555640942e-05, -1.27175948029918370e-05, -1.30469155369176746e-05, -1.32324318851263367e-05,
)


_PROTO = np.array(_PROTO_COEFFS, dtype=np.float64)
M_BANDS = 32
N_TAPS = 512


def _mod_banks() -> tuple[np.ndarray, np.ndarray]:
    """Cosine-modulated analysis/synthesis banks (Vaidyanathan ch. 8;
    the MPEG filterbank is this same odd-stacked modulation):
    h_k[n] = 2 h[n] cos((pi/M)(k+1/2)(n-(N-1)/2) + (-1)^k pi/4),
    f_k[n] = the mirror phase — the (-1)^k pi/4 terms make adjacent-
    band aliasing cancel under decimation by M."""
    n = np.arange(N_TAPS, dtype=np.float64)
    k = np.arange(M_BANDS)[:, None]
    arg = (np.pi / M_BANDS) * (k + 0.5) * (n[None, :] - (N_TAPS - 1) / 2)
    ph = ((-1.0) ** k) * np.pi / 4
    return (
        2.0 * _PROTO[None, :] * np.cos(arg + ph),
        2.0 * _PROTO[None, :] * np.cos(arg - ph),
    )


_H_BANK, _F_BANK = _mod_banks()


def analyze_pcm(pcm: np.ndarray) -> np.ndarray:
    """32-band analysis: (n_samples,) float PCM -> (n_samples // 32,
    32) subband samples. S[t, k] = sum_n h_k[n] x[32 t - n] — each
    band filtered then decimated by 32 (phase 0)."""
    pcm = np.asarray(pcm, dtype=np.float64)
    n_t = len(pcm) // 32
    xp = np.concatenate([np.zeros(N_TAPS - 1), pcm[: n_t * 32]])
    # windows[t] = x[32t - n] for n = 0..N-1  (reversed slice)
    idx = (
        np.arange(n_t)[:, None] * 32
        + (N_TAPS - 1)
        - np.arange(N_TAPS)[None, :]
    )
    return xp[idx] @ _H_BANK.T


def synthesize_pcm(subband: np.ndarray) -> np.ndarray:
    """32-band synthesis: (n_t, 32) subband samples -> (n_t * 32,)
    PCM. y[m] = 32 * sum_t sum_k S[t, k] f_k[m - 32 t] (the cascade's
    composite gain is 1/32 — decimation by 32 spreads each sample's
    energy); the N-1 sample filterbank delay is compensated so the
    output aligns with analyze_pcm's input."""
    subband = np.asarray(subband, dtype=np.float64)
    n_t = subband.shape[0]
    contrib = subband @ _F_BANK  # (n_t, 512)
    y = np.zeros(n_t * 32 + N_TAPS)
    for t in range(n_t):
        y[32 * t : 32 * t + N_TAPS] += contrib[t]
    return y[N_TAPS - 1 : N_TAPS - 1 + n_t * 32] * 32.0


# -------------------------------------------------------- PCM encode path
def default_allocation() -> list[int]:
    """Fixed allocation: 15 steps (4 bits/sample) for subbands 0-22,
    5 steps (grouped, 7 bits per 3 samples) for the top band group
    23-26 whose B.2a ladder is only {3, 5, 65535}. Budget: header 32
    + allocation 88 + scfsi 54 + scalefactors 486 + samples
    23*144 + 4*84 = 4308 bits ~ 539 bytes — fits the 576-byte
    192 kbps / 48 kHz mono frame. No psychoacoustic model (documented
    scope: rate control is by allocation choice, not masking)."""
    return [15] * 23 + [5] * (SBLIMIT - 23)


def encode_pcm_mp2(
    pcm: np.ndarray,
    sample_rate: int = 48000,
    bitrate_kbps: int = 192,
    allocation: list[int] | None = None,
) -> bytes:
    """Encode float PCM in [-1, 1) into a mono Layer II stream:
    32-band analysis -> per-12-sample-part scalefactor selection
    (tightest Table B.1 value bounding the part) -> midtread
    quantization v = round((s L / scf + L - 1) / 2) onto the class
    grid -> frame packing. scfsi = 0 (all three scalefactors sent)."""
    pcm = np.asarray(pcm, dtype=np.float64)
    n_frames = max(1, -(-len(pcm) // SAMPLES_PER_FRAME))
    pcm = np.concatenate(
        [pcm, np.zeros(n_frames * SAMPLES_PER_FRAME - len(pcm))]
    )
    sub = analyze_pcm(pcm)  # (n_frames * 36, 32)
    alloc = list(allocation) if allocation is not None else default_allocation()
    frames = []
    for f in range(n_frames):
        block = sub[f * 36 : (f + 1) * 36]  # (36, 32)
        coded = [sb for sb in range(SBLIMIT) if alloc[sb]]
        scf_idx: list[list[int]] = []
        codes: list[list[int]] = []
        for sb in coded:
            steps = alloc[sb]
            idx3 = []
            vs: list[int] = []
            for part in range(3):
                seg = block[12 * part : 12 * part + 12, sb]
                peak = float(np.max(np.abs(seg))) if len(seg) else 0.0
                i = 62
                while i > 0 and SCALEFACTORS[i] <= peak:
                    i -= 1
                idx3.append(i)
                scf = SCALEFACTORS[i]
                v = np.round((seg / scf * steps + steps - 1) / 2.0)
                vs.extend(
                    int(x) for x in np.clip(v, 0, steps - 1).astype(np.int64)
                )
            scf_idx.append(idx3)
            codes.append(vs)
        frames.append(
            Mp2Frame(
                bitrate_kbps=bitrate_kbps,
                sample_rate=sample_rate,
                allocation=alloc,
                scfsi=[0] * len(coded),
                scf_idx=scf_idx,
                codes=codes,
            )
        )
    return encode_mp2(frames)


def decode_mp2_pcm(data: bytes) -> tuple[int, np.ndarray]:
    """Full decode: Layer II stream -> (sample_rate, float PCM)."""
    frames = decode_mp2(data)
    if not frames:
        raise Mp2FormatError("empty stream")
    sub = np.concatenate([f.samples for f in frames], axis=0)
    return frames[0].sample_rate, synthesize_pcm(sub)
