"""Pure-Python/numpy VP8L (WebP lossless) codec.

Rounds 1-4 left WebP pixel decode on the disclosed fake-codec path,
arguing VP8L's 120-entry 2D distance table "can't be validated against
real encoders in this sandbox". Round 5 found the validation vector
that argument said didn't exist: CPython's own test fixture
``Lib/test/imghdrdata/python.webp`` carries an ALPH chunk with
compression method 1 — a REAL libwebp-produced VP8L bitstream — and
the same 16x16 logo ships as ``python.png`` in the same directory.
WebP alpha is lossless, so decoding the VP8L alpha plane must
byte-match the PNG's alpha channel (two independent encoders, two
independent decoders). tests/test_vp8l.py pins exactly that.

Decoder implements the WebP Lossless Bitstream Specification
(RFC 9649) in full:

- LSB-first bit reading; canonical prefix codes read MSB-of-code
  first (the DEFLATE convention the spec adopts);
- simple prefix codes (1-2 symbols) and normal codes via the
  19-symbol code-length code (order 17,18,0,1,...,15), RLE symbols
  16/17/18, and the optional max_symbol early-stop;
- meta prefix codes (entropy image), each group = 5 trees with
  alphabets [256+24+cache, 256, 256, 256, 40];
- color cache (hash key ``(0x1e35a7bd * argb) >> (32 - bits)``);
- LZ77 backward references: prefix-coded lengths/distances, distance
  codes 1..120 mapped through the spec's 2D neighbor table
  (regenerated here from its ordering rule — sorted by squared
  Euclidean distance, ties by larger y then larger x, over
  x in [-7, 8], y in [0, 7] — and pinned entry-by-entry in tests);
- all four transforms, inverted in reverse bitstream order:
  predictor (14 modes, including Select and the truncating
  ClampAddSubtractHalf), cross-color (signed 3.5 fixed-point
  multipliers), subtract-green, and color-indexing with 1/2/4-bit
  sub-byte bundling.

The encoder half (``encode_vp8l``) is the verification dual, as for
the JPEG/GIF/PNG codecs in sources/codecs.py: it exists so property
tests can round-trip randomized images through every decoder path
(palette, cache, LZ77 with 2D distances, per-block predictors,
cross-color, meta groups, RLE-coded code lengths). It favors
simplicity over compression.

Reference parity: Gigablast serves thumbnail/image bytes alongside
search results (Msg.cpp image cache paths); this engine treats media
as binary columns decoded by Arrow-batched kernels
(sources/multimodal.py). These kernels are pure bytes->array
functions and never touch Spark. The per-pixel LZ77/predictor loops
here are plain Python — fine for the test corpus; at 100 TB scale the
mapInPandas plumbing stays and libwebp slots into decode_webp.
"""

from __future__ import annotations

import struct
import zlib  # noqa: F401  (parity with codecs.py error contract imports)

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class BitReader:
    """LSB-first bit reader over bytes (RFC 9649 §4: values are
    assembled from the least-significant bit of each byte upward)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > self.nbits:
            raise ValueError("VP8L: bitstream overrun")
        self.pos = p + n
        v = 0
        got = 0
        while got < n:
            byte = self.data[(p + got) >> 3]
            bit_off = (p + got) & 7
            take = min(8 - bit_off, n - got)
            v |= ((byte >> bit_off) & ((1 << take) - 1)) << got
            got += take
        return v

    def read_bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise ValueError("VP8L: bitstream overrun")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class BitWriter:
    """LSB-first bit writer (encoder dual of BitReader)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, n: int) -> None:
        if n < 0 or value < 0 or (n < 64 and value >> n):
            raise ValueError("bad bit write")
        self.acc |= value << self.n
        self.n += n
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self.n:
            out.append(self.acc & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# prefix (Huffman) codes
# ---------------------------------------------------------------------------

# RFC 9649 §5.2.1: the order in which code-length-code lengths appear.
CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                     11, 12, 13, 14, 15)
MAX_CODE_LENGTH = 15


def canonical_codes(lengths):
    """DEFLATE-style canonical code assignment (RFC 1951 §3.2.2, which
    RFC 9649 adopts): codes assigned in order of (length, symbol).
    Returns {symbol: (length, code)}. Raises on an over-subscribed or
    incomplete code (unless exactly one symbol is used — the spec's
    zero-bit degenerate case, handled by the caller)."""
    pairs = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    if not pairs:
        raise ValueError("VP8L: empty prefix code")
    codes = {}
    code = 0
    prev_len = pairs[0][0]
    for ln, sym in pairs:
        code <<= ln - prev_len
        prev_len = ln
        codes[sym] = (ln, code)
        code += 1
    # completeness: after assigning all codes, code must equal 2^maxlen
    if code != (1 << prev_len):
        raise ValueError("VP8L: prefix code not complete")
    return codes


class PrefixCode:
    """Decodable prefix code. ``symbols`` maps (length, code) -> symbol;
    ``zero_bit`` short-circuits the spec's single-symbol codes (decoded
    consuming zero bits)."""

    __slots__ = ("map", "zero_bit", "max_len")

    def __init__(self, lengths=None, zero_bit_symbol=None):
        if zero_bit_symbol is not None:
            self.zero_bit = zero_bit_symbol
            self.map = None
            self.max_len = 0
            return
        used = [(s, ln) for s, ln in enumerate(lengths) if ln > 0]
        if len(used) == 1:
            # degenerate: one symbol, coded with zero bits
            self.zero_bit = used[0][0]
            self.map = None
            self.max_len = 0
            return
        self.zero_bit = None
        codes = canonical_codes(lengths)
        self.map = {(ln, code): sym for sym, (ln, code) in codes.items()}
        self.max_len = max(ln for ln, _ in self.map)

    def decode(self, br: BitReader) -> int:
        if self.zero_bit is not None:
            return self.zero_bit
        code = 0
        ln = 0
        m = self.map
        while ln <= self.max_len:
            code = (code << 1) | br.read_bit()
            ln += 1
            sym = m.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code in stream")


def _read_code_lengths(br: BitReader, cl_code: PrefixCode,
                       num_symbols: int) -> list:
    """Symbol code lengths via the code-length code, with RLE 16/17/18
    and the optional max_symbol cap (RFC 9649 §5.2.1)."""
    if br.read_bit():
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > num_symbols:
            raise ValueError("VP8L: max_symbol exceeds alphabet")
    else:
        max_symbol = num_symbols
    lengths = [0] * num_symbols
    prev_len = 8  # spec default when code 16 appears first
    symbol = 0
    while symbol < num_symbols:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code = cl_code.decode(br)
        if code < 16:
            lengths[symbol] = code
            symbol += 1
            if code:
                prev_len = code
        elif code == 16:
            repeat = br.read(2) + 3
            if symbol + repeat > num_symbols:
                raise ValueError("VP8L: code-length repeat overrun")
            for _ in range(repeat):
                lengths[symbol] = prev_len
                symbol += 1
        elif code == 17:
            repeat = br.read(3) + 3
            if symbol + repeat > num_symbols:
                raise ValueError("VP8L: zero-repeat overrun")
            symbol += repeat
        else:  # 18
            repeat = br.read(7) + 11
            if symbol + repeat > num_symbols:
                raise ValueError("VP8L: zero-repeat overrun")
            symbol += repeat
    return lengths


def read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    """One prefix code: simple (1-2 literal symbols) or normal
    (code-length-coded), per RFC 9649 §5.2.1."""
    if br.read_bit():  # simple
        num_symbols = br.read_bit() + 1
        first_8bit = br.read_bit()
        sym0 = br.read(8 if first_8bit else 1)
        if sym0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        if num_symbols == 1:
            return PrefixCode(zero_bit_symbol=sym0)
        sym1 = br.read(8)
        if sym1 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        # code 0 -> first symbol read, code 1 -> second (stream order,
        # not canonical-by-symbol)
        pc = PrefixCode.__new__(PrefixCode)
        pc.zero_bit = None
        pc.map = {(1, 0): sym0, (1, 1): sym1}
        pc.max_len = 1
        return pc
    num_codes = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = PrefixCode(cl_lengths)
    lengths = _read_code_lengths(br, cl_code, alphabet_size)
    return PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 distance mapping
# ---------------------------------------------------------------------------


def _build_dist_map():
    """The spec's 120-entry 2D neighbor table for distance codes
    1..120, regenerated from its ordering rule: all (dx, dy) with
    dx in [-7, 8], dy in [0, 7], (dy, dx) != (0, <=0), sorted by
    squared Euclidean distance, ties broken by larger dy then larger
    dx. tests/test_vp8l.py pins the table against the spec's printed
    prefix and the real libwebp stream exercises it end-to-end."""
    cands = [(x, y) for y in range(8) for x in range(-7, 9)
             if y > 0 or x > 0]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    assert len(cands) == 120
    return cands


DIST_MAP = _build_dist_map()
# encoder side: (dx, dy) -> distance code (1-based)
DIST_MAP_INV = {xy: i + 1 for i, xy in enumerate(DIST_MAP)}


def _prefix_value(br: BitReader, prefix: int) -> int:
    """LZ77 length/distance prefix decode (RFC 9649 §5.2.2)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int):
    """Inverse of _prefix_value: value -> (prefix_code, extra_bits,
    n_extra)."""
    if value < 1:
        raise ValueError("prefix value must be >= 1")
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    offset = (2 + ((v >> extra) & 1)) << extra
    return 2 * extra + ((v >> extra) & 1) + 2, v - offset, extra


# ---------------------------------------------------------------------------
# image stream decode
# ---------------------------------------------------------------------------

_HASH_MUL = 0x1E35A7BD


def _div_round_up(a: int, shift: int) -> int:
    return (a + (1 << shift) - 1) >> shift


def _decode_entropy_coded(br, w, h, groups, meta, meta_bits, meta_w,
                          cache_bits):
    """The LZ77 + color-cache pixel loop (RFC 9649 §5.2.2-5.2.3).
    Returns a flat uint32 ARGB array of w*h pixels."""
    npix = w * h
    out = np.zeros(npix, dtype=np.uint32)
    cache = np.zeros(1 << cache_bits, dtype=np.uint32) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0
    cache_limit = (1 << cache_bits) if cache_bits else 0
    pos = 0
    x = 0
    y = 0
    group = groups[0]
    single_group = meta is None
    while pos < npix:
        if not single_group:
            group = groups[meta[(y >> meta_bits) * meta_w
                                + (x >> meta_bits)]]
        g_code, r_code, b_code, a_code, d_code = group
        s = g_code.decode(br)
        if s < 256:
            red = r_code.decode(br)
            blue = b_code.decode(br)
            alpha = a_code.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache_bits:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> cache_shift] = px
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
        elif s < 280:
            length = _prefix_value(br, s - 256)
            dist_prefix = d_code.decode(br)
            dist_code = _prefix_value(br, dist_prefix)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > npix:
                raise ValueError("VP8L: backward reference out of range")
            if cache_bits:
                for _ in range(length):
                    px = out[pos - dist]
                    out[pos] = px
                    cache[(_HASH_MUL * int(px) & 0xFFFFFFFF)
                          >> cache_shift] = px
                    pos += 1
            elif dist >= length:
                out[pos:pos + length] = out[pos - dist:pos - dist + length]
                pos += length
            else:
                for _ in range(length):
                    out[pos] = out[pos - dist]
                    pos += 1
            x += length
            if x >= w:
                y += x // w
                x %= w
        else:
            idx = s - 280
            if cache is None or idx >= cache_limit:
                raise ValueError("VP8L: color-cache symbol without cache")
            out[pos] = cache[idx]
            pos += 1
            x += 1
            if x == w:
                x = 0
                y += 1
    return out


def _read_prefix_group(br, cache_bits):
    """One meta group = 5 prefix codes: green+length+cache, red, blue,
    alpha, distance."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    return (
        read_prefix_code(br, 256 + 24 + cache_size),
        read_prefix_code(br, 256),
        read_prefix_code(br, 256),
        read_prefix_code(br, 256),
        read_prefix_code(br, 40),
    )


def decode_image_stream(br: BitReader, w: int, h: int,
                        is_level0: bool) -> np.ndarray:
    """RFC 9649 §6 DecodeImageStream: optional transforms (level 0
    only), color-cache info, meta prefix info (level 0 only), prefix
    code groups, LZ77-coded pixels, then inverse transforms in reverse
    read order. Returns (h, w) uint32 ARGB."""
    transforms = []
    if is_level0:
        seen = set()
        while br.read_bit():
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("VP8L: duplicate transform")
            seen.add(ttype)
            if ttype == 0 or ttype == 1:  # predictor / cross-color
                size_bits = br.read(3) + 2
                bw = _div_round_up(w, size_bits)
                bh = _div_round_up(h, size_bits)
                sub = decode_image_stream(br, bw, bh, False)
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:  # subtract green
                transforms.append((2,))
            else:  # 3: color indexing
                n_colors = br.read(8) + 1
                pal_img = decode_image_stream(br, n_colors, 1, False)
                # palette entries are componentwise delta-coded
                pal = pal_img.reshape(-1).view(np.uint8).reshape(-1, 4)
                pal = (np.cumsum(pal.astype(np.uint32), axis=0)
                       & 0xFF).astype(np.uint8)
                pal32 = pal.copy().view(np.uint32).reshape(-1)
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, width_bits, pal32, w))
                w = _div_round_up(w, width_bits)
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: invalid color-cache size")
    meta = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if is_level0 and br.read_bit():
        meta_bits = br.read(3) + 2
        meta_w = _div_round_up(w, meta_bits)
        meta_h = _div_round_up(h, meta_bits)
        meta_img = decode_image_stream(br, meta_w, meta_h, False)
        meta = ((meta_img.reshape(-1) >> 8) & 0xFFFF).astype(np.int64)
        n_groups = int(meta.max()) + 1
    groups = [_read_prefix_group(br, cache_bits) for _ in range(n_groups)]
    pixels = _decode_entropy_coded(br, w, h, groups, meta, meta_bits,
                                   meta_w, cache_bits)
    img = pixels.reshape(h, w)
    if is_level0:
        for t in reversed(transforms):
            img = _apply_inverse_transform(img, t)
    return img


# ---------------------------------------------------------------------------
# transforms (inverse = decode side, forward = encoder dual)
# ---------------------------------------------------------------------------


def _argb_channels(img32: np.ndarray):
    """(h, w) uint32 -> (h, w, 4) uint8 as [a, r, g, b]."""
    a = (img32 >> 24).astype(np.uint8)
    r = ((img32 >> 16) & 0xFF).astype(np.uint8)
    g = ((img32 >> 8) & 0xFF).astype(np.uint8)
    b = (img32 & 0xFF).astype(np.uint8)
    return np.stack([a, r, g, b], axis=-1)


def _channels_argb(ch: np.ndarray) -> np.ndarray:
    ch = ch.astype(np.uint32)
    return ((ch[..., 0] << 24) | (ch[..., 1] << 16)
            | (ch[..., 2] << 8) | ch[..., 3])


def _avg2(a, b):
    return (a.astype(np.int32) + b.astype(np.int32)) >> 1


def _predict(mode, L, T, TL, TR):
    """One predictor (RFC 9649 §4.2.2), on int32 4-vectors [a,r,g,b].
    Returns int32 4-vector."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.int32)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:
        # Select: pick T or L, whichever is closer to the gradient
        # prediction L + T - TL (per-channel Manhattan metric)
        p_l = int(np.abs(T - TL).sum())   # |p - L| summed
        p_t = int(np.abs(L - TL).sum())   # |p - T| summed
        return T if p_t <= p_l else L
    if mode == 12:
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:
        ave = _avg2(L, T)
        d = ave - TL
        # C integer division truncates toward zero
        half = np.sign(d) * (np.abs(d) >> 1)
        return np.clip(ave + half, 0, 255)
    raise ValueError(f"VP8L: invalid predictor mode {mode}")


def _apply_inverse_transform(img: np.ndarray, t) -> np.ndarray:
    ttype = t[0]
    h, w = img.shape
    if ttype == 2:  # add green back
        g = (img >> 8) & 0xFF
        r = (((img >> 16) & 0xFF) + g) & 0xFF
        b = ((img & 0xFF) + g) & 0xFF
        return ((img & 0xFF000000) | (r << 16) | (g << 8) | b)
    if ttype == 1:  # cross-color inverse
        _, size_bits, sub = t
        # transform element per block: blue ch = green_to_red,
        # green ch = green_to_blue, red ch = red_to_blue (each a
        # signed 3.5 fixed-point multiplier; delta = (m * c) >> 5 on
        # the channel value reinterpreted as signed int8)
        by = np.arange(h) >> size_bits
        bx = np.arange(w) >> size_bits
        cte = sub[by][:, bx]
        g2r = (cte & 0xFF).astype(np.uint8).astype(np.int8).astype(np.int32)
        g2b = (((cte >> 8) & 0xFF).astype(np.uint8).astype(np.int8)
               .astype(np.int32))
        r2b = (((cte >> 16) & 0xFF).astype(np.uint8).astype(np.int8)
               .astype(np.int32))
        g_s = (((img >> 8) & 0xFF).astype(np.uint8).astype(np.int8)
               .astype(np.int32))
        red = (((img >> 16) & 0xFF).astype(np.int32)
               + ((g2r * g_s) >> 5)) & 0xFF
        # red_to_blue multiplies the RESTORED red (== original red on
        # the encoder side)
        red_s = red.astype(np.uint8).astype(np.int8).astype(np.int32)
        blue = ((img & 0xFF).astype(np.int32)
                + ((g2b * g_s) >> 5) + ((r2b * red_s) >> 5)) & 0xFF
        return ((img & 0xFF00FF00)
                | (red.astype(np.uint32) << 16) | blue.astype(np.uint32))
    if ttype == 0:  # predictor inverse
        _, size_bits, sub = t
        modes = ((sub >> 8) & 0xFF).astype(np.int64)
        res = _argb_channels(img).astype(np.int32)
        out = np.zeros_like(res)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = np.array([255, 0, 0, 0], dtype=np.int32)
                elif y == 0:
                    pred = out[0, x - 1]
                elif x == 0:
                    pred = out[y - 1, 0]
                else:
                    mode = int(modes[y >> size_bits, x >> size_bits])
                    L = out[y, x - 1]
                    T = out[y - 1, x]
                    TL = out[y - 1, x - 1]
                    # rightmost column: top-right wraps to the first
                    # pixel of the CURRENT row (contiguous-memory rule
                    # the spec codifies)
                    TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                    pred = _predict(mode, L, T, TL, TR)
                out[y, x] = (res[y, x] + pred) & 0xFF
        return _channels_argb(out.astype(np.uint8))
    if ttype == 3:  # color indexing inverse
        _, width_bits, pal32, orig_w = t
        if width_bits == 0:
            idx = (img >> 8) & 0xFF
        else:
            bits_per = 8 >> width_bits
            per = 1 << width_bits
            xs = np.arange(orig_w)
            packed = ((img >> 8) & 0xFF)[:, xs // per]
            shift = ((xs % per) * bits_per)[None, :]
            idx = (packed >> shift) & ((1 << bits_per) - 1)
        if int(idx.max(initial=0)) >= pal32.size:
            raise ValueError("VP8L: palette index out of range")
        return pal32[idx.astype(np.int64)]
    raise ValueError(f"VP8L: invalid transform {ttype}")


# ---------------------------------------------------------------------------
# public decode API
# ---------------------------------------------------------------------------


def _argb_to_rgba(img32: np.ndarray) -> np.ndarray:
    """(h, w) uint32 ARGB -> (h, w, 4) uint8 RGBA (the repo's image
    array convention, matching decode_png's alpha layout)."""
    ch = _argb_channels(img32)
    return ch[..., [1, 2, 3, 0]]


def decode_vp8l(data: bytes) -> np.ndarray:
    """Decode a VP8L chunk payload (starts with the 0x2f signature,
    then 14-bit width-1 / 14-bit height-1 / alpha hint / 3-bit
    version). Returns (h, w, 4) uint8 RGBA."""
    if len(data) < 5 or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature")
    br = BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint (informative)
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    return _argb_to_rgba(decode_image_stream(br, w, h, True))


def decode_vp8l_stream(data: bytes, w: int, h: int) -> np.ndarray:
    """Decode a HEADERLESS VP8L image stream of known dimensions — the
    form used by lossless-compressed ALPH chunks (RFC 9649 §4.5: 'the
    image stream does not contain any headers describing the image
    dimensions'). Returns (h, w) uint32 ARGB."""
    if w <= 0 or h <= 0:
        raise ValueError("VP8L: bad stream dimensions")
    return decode_image_stream(BitReader(data), w, h, True)


def _walk_riff(payload: bytes):
    """Yield (fourcc, chunk_payload) for top-level RIFF chunks after
    the 12-byte WEBP header. Chunks pad to even length."""
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cc = payload[pos:pos + 4]
        sz = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if pos + 8 + sz > n:
            raise ValueError("WebP: truncated chunk")
        yield cc, payload[pos + 8:pos + 8 + sz]
        pos += 8 + sz + (sz & 1)


def decode_alph(alph_payload: bytes, w: int, h: int) -> np.ndarray:
    """Decode an ALPH chunk payload to the (h, w) uint8 alpha plane.
    Header byte: bits 0-1 compression (0 = raw, 1 = VP8L-coded with
    alpha in the GREEN channel), bits 2-3 filtering, bits 4-5
    preprocessing. Only filter 0 / preprocessing 0 are implemented —
    they are what the real-stream validation vector exercises; the
    other filter modes would be self-validated guesses and stay
    ValueError by the same discipline that kept VP8 lossy out."""
    if not alph_payload:
        raise ValueError("ALPH: empty payload")
    hdr = alph_payload[0]
    compression = hdr & 3
    filtering = (hdr >> 2) & 3
    preprocessing = (hdr >> 4) & 3
    if preprocessing != 0:
        raise ValueError("ALPH: level-reduction preprocessing "
                         "not supported")
    if filtering != 0:
        raise ValueError("ALPH: prediction filters not supported")
    body = alph_payload[1:]
    if compression == 0:
        if len(body) < w * h:
            raise ValueError("ALPH: truncated raw alpha plane")
        return (np.frombuffer(body[:w * h], dtype=np.uint8)
                .reshape(h, w).copy())
    if compression != 1:
        raise ValueError("ALPH: unknown compression method")
    img = decode_vp8l_stream(body, w, h)
    return ((img >> 8) & 0xFF).astype(np.uint8)


def decode_webp(payload: bytes) -> np.ndarray:
    """Decode a WebP container to (h, w, 4) uint8 RGBA. REAL for
    lossless (VP8L) payloads, standalone or inside VP8X; lossy VP8
    pixel decode genuinely needs libwebp (boolean arithmetic decoder +
    intra predictors + loop filter) and raises NotImplementedError so
    callers can route it to their disclosed fallback. Animated files
    raise NotImplementedError from THIS single-image entry point —
    use decode_webp_frames, which composites VP8L-coded animations
    for real (sample_frames routes there)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    for cc, body in _walk_riff(payload):
        if cc == b"VP8L":
            return decode_vp8l(body)
        if cc == b"VP8X":
            if body[0] & 0x02:
                raise NotImplementedError(
                    "animated WebP pixel decode not supported")
            continue
        if cc == b"VP8 ":
            raise NotImplementedError(
                "lossy VP8 pixel decode needs libwebp")
        # ALPH/ICCP/EXIF/XMP and unknown chunks: skip
    raise ValueError("WebP: no image bitstream chunk found")


def decode_webp_frames(payload: bytes):
    """Animated WebP (VP8X+ANIM+ANMF) → [(ts_ms, (h, w, 4) RGBA)]
    composited frames at their start timestamps, REAL for
    VP8L-coded frames (lossy-VP8 frames raise NotImplementedError,
    the disclosed fallback route). Compositing per RFC 9649:
    frames place at (2*X, 2*Y); blend bit 0 alpha-blends the frame
    over the canvas, 1 overwrites the rect; dispose bit 1 fills the
    frame rect with the ANIM background color (stored B,G,R,A) after
    display. The initial canvas is transparent. A non-animated
    payload returns its single still at ts 0."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    canvas_w = canvas_h = None
    animated = False
    bg_rgba = np.zeros(4, dtype=np.float32)
    frames = []
    ts = 0
    canvas = None
    for cc, body in _walk_riff(payload):
        if cc == b"VP8X":
            animated = bool(body[0] & 0x02)
            canvas_w = 1 + int.from_bytes(body[4:7], "little")
            canvas_h = 1 + int.from_bytes(body[7:10], "little")
        elif cc == b"ANIM":
            b_, g_, r_, a_ = body[0], body[1], body[2], body[3]
            bg_rgba = np.array([r_, g_, b_, a_], dtype=np.float32)
        elif cc == b"ANMF":
            if canvas_w is None:
                raise ValueError("WebP: ANMF before VP8X")
            if canvas is None:
                canvas = np.zeros((canvas_h, canvas_w, 4),
                                  dtype=np.uint8)
            fx = 2 * int.from_bytes(body[0:3], "little")
            fy = 2 * int.from_bytes(body[3:6], "little")
            fw = 1 + int.from_bytes(body[6:9], "little")
            fh = 1 + int.from_bytes(body[9:12], "little")
            dur = int.from_bytes(body[12:15], "little")
            flags = body[15]
            no_blend = bool(flags & 0x02)
            dispose_bg = bool(flags & 0x01)
            # frame bitstream: sub-chunks after the 16-byte header
            sub = body[16:]
            fr = None
            spos = 0
            while spos + 8 <= len(sub):
                scc = sub[spos:spos + 4]
                ssz = int.from_bytes(sub[spos + 4:spos + 8], "little")
                sbody = sub[spos + 8:spos + 8 + ssz]
                if scc == b"VP8L":
                    fr = decode_vp8l(sbody)
                elif scc == b"VP8 ":
                    raise NotImplementedError(
                        "lossy VP8 animation frames need libwebp")
                spos += 8 + ssz + (ssz & 1)
            if fr is None:
                raise ValueError("WebP: ANMF without a frame "
                                 "bitstream")
            if fr.shape[0] != fh or fr.shape[1] != fw:
                raise ValueError("WebP: frame dims disagree with "
                                 "ANMF header")
            if fx + fw > canvas_w or fy + fh > canvas_h:
                raise ValueError("WebP: frame outside canvas")
            region = canvas[fy:fy + fh, fx:fx + fw]
            if no_blend:
                region[:] = fr
            else:
                fa = fr[:, :, 3:4].astype(np.float32) / 255.0
                ca = region[:, :, 3:4].astype(np.float32) / 255.0
                out_a = fa + ca * (1.0 - fa)
                safe = np.maximum(out_a, 1e-6)
                out_rgb = (fr[:, :, :3] * fa
                           + region[:, :, :3] * ca * (1.0 - fa)) / safe
                region[:, :, :3] = np.clip(
                    np.round(out_rgb), 0, 255).astype(np.uint8)
                region[:, :, 3] = np.clip(
                    np.round(out_a[:, :, 0] * 255.0), 0, 255
                ).astype(np.uint8)
            frames.append((ts, canvas.copy()))
            if dispose_bg:
                canvas[fy:fy + fh, fx:fx + fw] = np.clip(
                    np.round(bg_rgba), 0, 255).astype(np.uint8)
            ts += dur
    if animated and frames:
        return frames
    # still image (or animated flag without ANMF frames)
    return [(0, decode_webp(payload))]


def encode_webp_anim(frames, durations_ms, canvas_wh=None,
                     offsets=None, blends=None, disposes=None,
                     bg_rgba=(0, 0, 0, 0)) -> bytes:
    """Encoder dual for decode_webp_frames: VP8X+ANIM+ANMF container
    with VP8L-coded frames."""
    if offsets is None:
        offsets = [(0, 0)] * len(frames)
    if blends is None:
        blends = [True] * len(frames)  # True = alpha-blend
    if disposes is None:
        disposes = [False] * len(frames)
    if canvas_wh is None:
        canvas_wh = (frames[0].shape[1], frames[0].shape[0])
    cw, ch = canvas_wh
    chunks = []
    vp8x = bytes([0x12, 0, 0, 0]) + (cw - 1).to_bytes(3, "little") \
        + (ch - 1).to_bytes(3, "little")
    chunks.append((b"VP8X", vp8x))
    r, g, b, a = bg_rgba
    chunks.append((b"ANIM", bytes([b, g, r, a]) + (0).to_bytes(2,
                                                               "little")))
    for fr, dur, (fx, fy), blend, disp in zip(
            frames, durations_ms, offsets, blends, disposes):
        if fx % 2 or fy % 2:
            raise ValueError("frame offsets must be even (stored /2)")
        fh, fw = fr.shape[:2]
        vp8l_file = encode_vp8l(fr)
        vp8l_body = [bb for cc2, bb in _walk_riff(vp8l_file)
                     if cc2 == b"VP8L"][0]
        flags = (0 if blend else 0x02) | (0x01 if disp else 0)
        hdr = ((fx // 2).to_bytes(3, "little")
               + (fy // 2).to_bytes(3, "little")
               + (fw - 1).to_bytes(3, "little")
               + (fh - 1).to_bytes(3, "little")
               + int(dur).to_bytes(3, "little") + bytes([flags]))
        inner = b"VP8L" + struct.pack("<I", len(vp8l_body)) \
            + vp8l_body + (b"\x00" if len(vp8l_body) & 1 else b"")
        chunks.append((b"ANMF", hdr + inner))
    out = b""
    for cc, body in chunks:
        out += cc + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            out += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WEBP" + out


# ---------------------------------------------------------------------------
# encoder (verification dual)
# ---------------------------------------------------------------------------


def _huffman_lengths(freqs, max_len):
    """Code lengths for a canonical prefix code, depth-limited to
    max_len by frequency flattening (halve-and-rebuild: as frequencies
    approach uniform the tree approaches balanced, and every alphabet
    here is small enough that a balanced tree fits the limit)."""
    import heapq
    import itertools

    n = len(freqs)
    lengths = [0] * n
    active = [(f, i) for i, f in enumerate(freqs) if f > 0]
    if not active:
        return lengths
    if len(active) == 1:
        lengths[active[0][1]] = 1
        return lengths
    fs = {i: f for f, i in active}
    while True:
        counter = itertools.count()
        heap = [(f, next(counter), ("s", i)) for i, f in fs.items()]
        heapq.heapify(heap)
        while len(heap) > 1:
            f1, _, n1 = heapq.heappop(heap)
            f2, _, n2 = heapq.heappop(heap)
            heapq.heappush(heap, (f1 + f2, next(counter), ("n", n1, n2)))
        depths = {}
        stack = [(heap[0][2], 0)]
        while stack:
            node, d = stack.pop()
            if node[0] == "s":
                depths[node[1]] = max(d, 1)
            else:
                stack.append((node[1], d + 1))
                stack.append((node[2], d + 1))
        if max(depths.values()) <= max_len:
            for i, d in depths.items():
                lengths[i] = d
            return lengths
        fs = {i: (f + 1) // 2 for i, f in fs.items()}


def _encode_map(lengths):
    """{symbol: (length, code)} matching the decoder's construction;
    a single used symbol is coded with zero bits."""
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if len(used) == 1:
        return {used[0]: (0, 0)}
    return canonical_codes(lengths)


def _write_code_msb(bw: BitWriter, code: int, length: int) -> None:
    """Prefix codes go to the stream most-significant-bit first (the
    DEFLATE convention)."""
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _rle_code_lengths(lengths):
    """Symbol stream for a normal code's code-length sequence, using
    RLE codes 16 (repeat prev non-zero, 3-6) and 17/18 (zero runs) so
    the decoder's RLE paths get exercised. Yields (code, extra,
    n_extra)."""
    out = []
    i = 0
    n = len(lengths)
    while i < n:
        v = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == v:
            run += 1
        i += run
        if v == 0:
            while run >= 11:
                take = min(run, 138)
                out.append((18, take - 11, 7))
                run -= take
            if run >= 3:
                out.append((17, run - 3, 3))
                run = 0
            out.extend((0, 0, 0) for _ in range(run))
        else:
            out.append((v, 0, 0))
            run -= 1
            while run >= 3:
                take = min(run, 6)
                out.append((16, take - 3, 2))
                run -= take
            out.extend((v, 0, 0) for _ in range(run))
    return out


def _write_normal_code(bw: BitWriter, lengths) -> None:
    """Write a code-length-coded ('normal') prefix code."""
    sym_stream = _rle_code_lengths(lengths)
    cl_freqs = [0] * 19
    for code, _, _ in sym_stream:
        cl_freqs[code] += 1
    cl_lengths = _huffman_lengths(cl_freqs, 7)
    cl_map = _encode_map(cl_lengths)
    num = 19
    while num > 4 and cl_lengths[CODE_LENGTH_ORDER[num - 1]] == 0:
        num -= 1
    bw.write(num - 4, 4)
    for i in range(num):
        bw.write(cl_lengths[CODE_LENGTH_ORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol cap
    for code, extra, n_extra in sym_stream:
        ln, c = cl_map[code]
        _write_code_msb(bw, c, ln)
        if n_extra:
            bw.write(extra, n_extra)


def _build_and_write_code(bw: BitWriter, freqs):
    """Write one prefix code (simple if it fits, else normal); return
    the {symbol: (length, code)} encode map."""
    used = [s for s, f in enumerate(freqs) if f > 0]
    if not used:
        used = [0]  # unused tree: 1-symbol placeholder, zero bits
    if len(used) == 1 and used[0] <= 255:
        s = used[0]
        bw.write(1, 1)  # simple
        bw.write(0, 1)  # one symbol
        if s <= 1:
            bw.write(0, 1)
            bw.write(s, 1)
        else:
            bw.write(1, 1)
            bw.write(s, 8)
        return {s: (0, 0)}
    if len(used) == 2 and used[1] <= 255:
        s0, s1 = used
        bw.write(1, 1)  # simple
        bw.write(1, 1)  # two symbols
        if s0 <= 1:
            bw.write(0, 1)
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        bw.write(s1, 8)
        return {s0: (1, 0), s1: (1, 1)}
    lengths = _huffman_lengths(freqs, MAX_CODE_LENGTH)
    nonzero = [i for i, ln in enumerate(lengths) if ln]
    if len(nonzero) == 1:
        # a lone symbol > 255 can't ride a simple code (8-bit symbol
        # field); pair it with a dummy symbol 0 so the canonical code
        # is complete at one bit each (the dummy never appears in the
        # data stream)
        lengths[nonzero[0]] = 1
        lengths[0 if nonzero[0] != 0 else 1] = 1
    bw.write(0, 1)  # normal
    _write_normal_code(bw, lengths)
    return _encode_map(lengths)


def _tokenize(flat, w, cache_bits, use_lz77):
    """Greedy token stream over flat uint32 pixels: ('lit', argb) /
    ('cache', idx) / ('copy', length, distance). Mirrors the decoder's
    cache-update discipline exactly."""
    npix = flat.size
    cache = np.zeros(1 << cache_bits, dtype=np.uint32) if cache_bits \
        else None
    shift = 32 - cache_bits if cache_bits else 0
    tokens = []
    pos = 0
    flat_l = flat.tolist()
    while pos < npix:
        best_len = 0
        best_dist = 0
        if use_lz77:
            for dist in (1, 2, w - 1, w, w + 1):
                if 1 <= dist <= pos:
                    ln = 0
                    while (pos + ln < npix and ln < 4096
                           and flat_l[pos + ln - dist]
                           == flat_l[pos + ln]):
                        ln += 1
                    if ln > best_len:
                        best_len, best_dist = ln, dist
        if best_len >= 3:
            tokens.append(("copy", best_len, best_dist, pos))
            if cache_bits:
                for i in range(pos, pos + best_len):
                    px = flat_l[i]
                    cache[(_HASH_MUL * px & 0xFFFFFFFF) >> shift] = px
            pos += best_len
        else:
            px = flat_l[pos]
            if cache_bits:
                key = (_HASH_MUL * px & 0xFFFFFFFF) >> shift
                if int(cache[key]) == px:
                    tokens.append(("cache", key, None, pos))
                else:
                    cache[key] = px
                    tokens.append(("lit", px, None, pos))
            else:
                tokens.append(("lit", px, None, pos))
            pos += 1
    return tokens


def _dist_to_code(dist: int, w: int) -> int:
    """Distance -> distance code, preferring the 2D map."""
    dy, dx = divmod(dist, w)
    for cand in ((dx, dy), (dx - w, dy + 1)):
        code = DIST_MAP_INV.get(cand)
        if code is not None and cand[1] * w + cand[0] == dist:
            return code
    return dist + 120


def _encode_entropy_stream(bw, flat, w, h, is_level0, cache_bits=0,
                           use_lz77=False, meta_split=False):
    """Write <color-cache-info> [<meta-prefix>] <prefix codes> <data>
    for one image stream."""
    if flat.size != w * h:
        raise ValueError(f"stream pixel count {flat.size} != {w}x{h}")
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    meta = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if is_level0:
        if meta_split and h >= 2:
            meta_bits = 2
            meta_w = _div_round_up(w, meta_bits)
            meta_h = _div_round_up(h, meta_bits)
            rows = np.arange(meta_h)
            # top half of block-rows -> group 0, bottom -> group 1
            meta_img = np.where(rows[:, None] < meta_h // 2, 0, 1
                                ).astype(np.uint32) << 8
            meta_img = np.broadcast_to(meta_img, (meta_h, meta_w)).copy()
            bw.write(1, 1)
            bw.write(meta_bits - 2, 3)
            _encode_entropy_stream(bw, meta_img.reshape(-1), meta_w,
                                   meta_h, False)
            meta = ((meta_img.reshape(-1) >> 8) & 0xFFFF).astype(np.int64)
            n_groups = int(meta.max()) + 1
        else:
            bw.write(0, 1)
    tokens = _tokenize(flat, w, cache_bits, use_lz77)

    def group_of(pos):
        if meta is None:
            return 0
        y, x = divmod(pos, w)
        return int(meta[(y >> meta_bits) * meta_w + (x >> meta_bits)])

    cache_size = (1 << cache_bits) if cache_bits else 0
    g_freqs = [[0] * (256 + 24 + cache_size) for _ in range(n_groups)]
    r_freqs = [[0] * 256 for _ in range(n_groups)]
    b_freqs = [[0] * 256 for _ in range(n_groups)]
    a_freqs = [[0] * 256 for _ in range(n_groups)]
    d_freqs = [[0] * 40 for _ in range(n_groups)]
    emission = []
    for kind, v1, v2, pos in tokens:
        g = group_of(pos)
        if kind == "lit":
            alpha = (v1 >> 24) & 0xFF
            red = (v1 >> 16) & 0xFF
            green = (v1 >> 8) & 0xFF
            blue = v1 & 0xFF
            g_freqs[g][green] += 1
            r_freqs[g][red] += 1
            b_freqs[g][blue] += 1
            a_freqs[g][alpha] += 1
            emission.append((g, "lit", green, red, blue, alpha))
        elif kind == "cache":
            g_freqs[g][280 + v1] += 1
            emission.append((g, "cache", v1))
        else:
            lp, lex, lnb = _prefix_encode(v1)
            dcode = _dist_to_code(v2, w)
            dp, dex, dnb = _prefix_encode(dcode)
            g_freqs[g][256 + lp] += 1
            d_freqs[g][dp] += 1
            emission.append((g, "copy", lp, lex, lnb, dp, dex, dnb))
    maps = []
    for g in range(n_groups):
        maps.append((
            _build_and_write_code(bw, g_freqs[g]),
            _build_and_write_code(bw, r_freqs[g]),
            _build_and_write_code(bw, b_freqs[g]),
            _build_and_write_code(bw, a_freqs[g]),
            _build_and_write_code(bw, d_freqs[g]),
        ))
    for item in emission:
        g = item[0]
        gm, rm, bm, am, dm = maps[g]
        if item[1] == "lit":
            _, _, green, red, blue, alpha = item
            _write_code_msb(bw, *reversed(gm[green]))
            _write_code_msb(bw, *reversed(rm[red]))
            _write_code_msb(bw, *reversed(bm[blue]))
            _write_code_msb(bw, *reversed(am[alpha]))
        elif item[1] == "cache":
            _write_code_msb(bw, *reversed(gm[280 + item[2]]))
        else:
            _, _, lp, lex, lnb, dp, dex, dnb = item
            _write_code_msb(bw, *reversed(gm[256 + lp]))
            if lnb:
                bw.write(lex, lnb)
            _write_code_msb(bw, *reversed(dm[dp]))
            if dnb:
                bw.write(dex, dnb)


def encode_vp8l(rgba: np.ndarray, *, palette: bool = False,
                subtract_green: bool = False,
                predictor_bits: int | None = None,
                predictor_modes: np.ndarray | None = None,
                color_bits: int | None = None,
                color_ctes: np.ndarray | None = None,
                cache_bits: int = 0, use_lz77: bool = True,
                meta_split: bool = False) -> bytes:
    """Encode (h, w, 4) uint8 RGBA to a complete RIFF WEBP/VP8L file.

    This is the verification dual for decode_webp — options select
    which decoder paths a round-trip exercises; it does not try to
    compress well. ``palette`` is mutually exclusive with the pixel
    transforms. Transform bitstream order (and forward application
    order) is subtract-green, cross-color, predictor."""
    if rgba.ndim != 3 or rgba.shape[2] != 4 or rgba.dtype != np.uint8:
        raise ValueError("encode_vp8l expects (h, w, 4) uint8 RGBA")
    h, w = rgba.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("encode_vp8l: dimensions out of range")
    img = ((rgba[..., 3].astype(np.uint32) << 24)
           | (rgba[..., 0].astype(np.uint32) << 16)
           | (rgba[..., 1].astype(np.uint32) << 8)
           | rgba[..., 2].astype(np.uint32))
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1, 1)  # alpha may be used
    bw.write(0, 3)  # version
    enc_w = w
    if palette:
        if subtract_green or predictor_bits or color_bits:
            raise ValueError("palette excludes the pixel transforms "
                             "in this encoder")
        colors, inv = np.unique(img.reshape(-1), return_inverse=True)
        if colors.size > 256:
            raise ValueError("too many colors for palette mode")
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(colors.size - 1, 8)
        pal_ch = colors.view(np.uint8).reshape(-1, 4).astype(np.int32)
        deltas = np.diff(np.vstack([np.zeros((1, 4), np.int32), pal_ch]),
                         axis=0) & 0xFF
        pal_img = deltas.astype(np.uint8).reshape(-1).view(np.uint32)
        _encode_entropy_stream(bw, pal_img, colors.size, 1, False)
        n = colors.size
        width_bits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        idx = inv.reshape(h, w).astype(np.uint32)
        if width_bits:
            per = 1 << width_bits
            bits_per = 8 >> width_bits
            enc_w = _div_round_up(w, width_bits)
            packed = np.zeros((h, enc_w), dtype=np.uint32)
            for j in range(per):
                cols = np.arange(j, w, per)
                packed[:, :cols.size] |= (idx[:, cols]
                                          << (j * bits_per))
        else:
            enc_w = w
            packed = idx
        img = 0xFF000000 | (packed << 8)
        bw.write(0, 1)  # no more transforms
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            g = (img >> 8) & 0xFF
            r = (((img >> 16) & 0xFF) - g) & 0xFF
            b = ((img & 0xFF) - g) & 0xFF
            img = (img & 0xFF00FF00) | (r << 16) | b
        if color_bits is not None:
            bw.write(1, 1)
            bw.write(1, 2)
            bw.write(color_bits - 2, 3)
            bwidth = _div_round_up(w, color_bits)
            bheight = _div_round_up(h, color_bits)
            if color_ctes is None:
                color_ctes = np.full((bheight, bwidth), 0xFF100A05,
                                     dtype=np.uint32)
            _encode_entropy_stream(bw, color_ctes.reshape(-1)
                                   .astype(np.uint32), bwidth, bheight,
                                   False)
            cte = color_ctes[np.arange(h) >> color_bits][
                :, np.arange(w) >> color_bits]
            g2r = (cte & 0xFF).astype(np.uint8).astype(np.int8
                                                       ).astype(np.int32)
            g2b = ((cte >> 8) & 0xFF).astype(np.uint8).astype(
                np.int8).astype(np.int32)
            r2b = ((cte >> 16) & 0xFF).astype(np.uint8).astype(
                np.int8).astype(np.int32)
            g_s = ((img >> 8) & 0xFF).astype(np.uint8).astype(
                np.int8).astype(np.int32)
            red0 = ((img >> 16) & 0xFF).astype(np.int32)
            red0_s = red0.astype(np.uint8).astype(np.int8).astype(
                np.int32)
            red = (red0 - ((g2r * g_s) >> 5)) & 0xFF
            blue = ((img & 0xFF).astype(np.int32)
                    - ((g2b * g_s) >> 5) - ((r2b * red0_s) >> 5)) & 0xFF
            img = ((img & 0xFF00FF00) | (red.astype(np.uint32) << 16)
                   | blue.astype(np.uint32))
        if predictor_bits is not None:
            bw.write(1, 1)
            bw.write(0, 2)
            bw.write(predictor_bits - 2, 3)
            bwidth = _div_round_up(w, predictor_bits)
            bheight = _div_round_up(h, predictor_bits)
            if predictor_modes is None:
                predictor_modes = np.full((bheight, bwidth), 2,
                                          dtype=np.uint32)
            _encode_entropy_stream(
                bw, (0xFF000000
                     | (predictor_modes.astype(np.uint32) << 8)
                     ).reshape(-1), bwidth, bheight, False)
            src = _argb_channels(img).astype(np.int32)
            res = np.zeros_like(src)
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = np.array([255, 0, 0, 0], dtype=np.int32)
                    elif y == 0:
                        pred = src[0, x - 1]
                    elif x == 0:
                        pred = src[y - 1, 0]
                    else:
                        mode = int(predictor_modes[y >> predictor_bits,
                                                   x >> predictor_bits])
                        TR = src[y - 1, x + 1] if x + 1 < w else src[y, 0]
                        pred = _predict(mode, src[y, x - 1],
                                        src[y - 1, x], src[y - 1, x - 1],
                                        TR)
                    res[y, x] = (src[y, x] - pred) & 0xFF
            img = _channels_argb(res.astype(np.uint8))
        bw.write(0, 1)  # no more transforms
    _encode_entropy_stream(bw, img.reshape(-1), enc_w, h, True,
                           cache_bits=cache_bits, use_lz77=use_lz77,
                           meta_split=meta_split)
    chunk = b"\x2f" + bw.getvalue()
    if len(chunk) & 1:
        padded = chunk + b"\x00"
    else:
        padded = chunk
    vp8l_chunk = b"VP8L" + struct.pack("<I", len(chunk)) + padded
    riff = (b"RIFF" + struct.pack("<I", 4 + len(vp8l_chunk))
            + b"WEBP" + vp8l_chunk)
    return riff
