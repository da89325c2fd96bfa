"""SmallFloat parity tests.

Golden values hand-derived from the reference algorithm
(util/SmallFloat.java:103-167): NUM_FREE_VALUES = 255 - longToInt4(2^31-1)
= 24, identity below 24, 4-significant-bit quantization above.
"""

import numpy as np
import pytest

from lucene_spark.analysis import smallfloat as sf


def test_num_free_values():
    assert sf.NUM_FREE_VALUES == 24


@pytest.mark.parametrize(
    "value,expected_code",
    [
        (0, 0),
        (1, 1),
        (23, 23),
        (24, 24),  # 24 + longToInt4(0) = 24
        (31, 31),  # 24 + longToInt4(7) = 31
        (32, 32),  # 24 + longToInt4(8): numBits=4, shift=0 -> 8|0 -> enc 8 -> 32
        (39, 39),  # 24+15: longToInt4(15)=15 — still exact (numBits==4)
        (40, 40),  # 24+16: longToInt4(16) decodes exactly (trailing zero bit)
        (41, 40),  # 24+17: first lossy value — quantized down to 40's bucket
        (100, 57),  # 24 + longToInt4(76): shift=3, (76>>3)&7=1, |(4<<3) -> 33; 24+33=57
    ],
)
def test_int_to_byte4_golden(value, expected_code):
    assert sf.int_to_byte4(value) == expected_code


def test_long_to_int4_roundtrip_quantization():
    # decode(encode(x)) keeps the top 4 significant bits of x
    for x in [0, 1, 7, 8, 15, 16, 17, 100, 1000, 2**20 + 12345]:
        dec = sf.int4_to_long(sf.long_to_int4(x))
        assert dec <= x
        # re-encoding the decoded value is a fixpoint
        assert sf.long_to_int4(dec) == sf.long_to_int4(x)
        if x >= 8:
            nbits = x.bit_length()
            assert dec == (x >> (nbits - 4)) << (nbits - 4)
        else:
            assert dec == x


def test_byte4_roundtrip_fixpoint_and_monotonic():
    prev = -1
    for code in range(256):
        v = sf.byte4_to_int(code)
        assert v > prev  # strictly increasing decode table
        assert sf.int_to_byte4(v) == code  # decode is a fixpoint of encode
        prev = v


def test_encode_monotonic_and_lossy_bound():
    prev_code = 0
    for x in range(0, 70000):
        c = sf.int_to_byte4(x)
        assert c >= prev_code
        assert sf.byte4_to_int(c) <= x
        prev_code = c


def test_vectorized_matches_scalar():
    xs = np.concatenate(
        [np.arange(0, 5000), np.array([2**20, 2**30, 2**31 - 1], dtype=np.int64)]
    )
    vec = sf.int_to_byte4_np(xs)
    scal = np.array([sf.int_to_byte4(int(x)) for x in xs])
    np.testing.assert_array_equal(vec, scal)
    np.testing.assert_array_equal(
        sf.byte4_to_int_np(vec), np.array([sf.byte4_to_int(int(c)) for c in vec])
    )


def test_negative_raises():
    with pytest.raises(ValueError):
        sf.int_to_byte4(-1)
    with pytest.raises(ValueError):
        sf.long_to_int4(-5)
