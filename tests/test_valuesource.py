"""Unit pins for the classic ValueSource family (lucene_ray.valuesource).
The end-to-end float32 parity gate is the ft_function_query oracle
entry; these pin the reference quirks in isolation."""

import math

import numpy as np

import lucene_ray.valuesource as v
from lucene_ray.smallfloat import byte4_to_int


class Ctx:
    n_docs = 5
    field_len = np.array([3, 10, 0, 7, 100], dtype=np.int64)
    norm_bytes = np.array([3, 10, 0, 7, 100], dtype=np.int64)
    len_col = "len"
    qlen_col = "qlen"
    sum_ttf = 1000

    def freq(self, t):
        return {"a": np.array([2, 0, 1, 5, 0]),
                "b": np.array([0, 0, 0, 0, 0])}[t]

    def freq_col(self, t):
        return f"f_{t}"

    def df(self, t):
        return int((self.freq(t) > 0).sum())

    def ttf(self, t):
        return int(self.freq(t).sum())


def test_norm_table_quirk():
    t = v._norm_table()
    # TFIDFSimilarity.java:447 — normTable[0] = 1f / normTable[255]
    assert t[0] == np.float32(1.0) / t[255]
    assert t[7] == np.float32(1.0 / math.sqrt(byte4_to_int(7)))
    # byte 0 lookup via eval
    out = v.norm().eval(Ctx())
    assert out[2] == t[0]


def test_tf_idf_and_stats():
    c = Ctx()
    assert np.allclose(v.tf("a").eval(c),
                       np.sqrt([2, 0, 1, 5, 0]).astype(np.float32))
    # ClassicSimilarity.idf: (float)(ln((maxDoc+1)/(df+1)) + 1)
    expected = np.float32(math.log((5 + 1) / float(3 + 1)) + 1.0)
    assert v.idf("a").eval(c)[0] == expected
    assert v.docfreq("a").eval(c)[0] == np.float32(3)
    assert v.total_term_freq("a").eval(c)[0] == np.float32(8)


def test_float_functions_op_order():
    c = Ctx()
    r = v.reciprocal(v.int_field(), 0.5, 2.0, 1.0).eval(c)
    flen = c.field_len.astype(np.float32)
    assert (r == np.float32(2.0)
            / (np.float32(0.5) * flen + np.float32(1.0))).all()
    lin = v.linear(v.term_freq("a"), 3.0, -1.0).eval(c)
    assert (lin == c.freq("a").astype(np.float32) * np.float32(3.0)
            + np.float32(-1.0)).all()
    rm = v.rangemap(v.term_freq("a"), 1.0, 2.0, v.const(9.0)).eval(c)
    assert rm.tolist() == [9.0, 0.0, 9.0, 5.0, 0.0]


def test_scale_degenerate_and_normal():
    c = Ctx()
    s = v.scale(v.term_freq("b"), 0.0, 1.0).eval(c)   # all-equal source
    assert (s == np.float32(0.0)).all()               # scale = 0 + lo
    s2 = v.scale(v.term_freq("a"), 0.0, 1.0).eval(c)
    assert s2.min() == np.float32(0.0) and s2.max() == np.float32(1.0)


def test_function_query_clamp():
    c = Ctx()
    out = v.function_query_scores(v.linear(v.int_field(), 1.0, -5.0), c)
    # negatives (and NaN) clamp to 0 — FunctionQuery.java:132
    assert out.tolist() == [0.0, 5.0, 0.0, 2.0, 95.0]
    nan_src = v.divf(v.term_freq("b"), v.term_freq("b"))   # 0/0 = NaN
    out2 = v.function_query_scores(nan_src, c)
    assert (out2 == 0.0).all()


def test_bool_and_if_functions():
    c = Ctx()
    g = v.cmp("gt", v.term_freq("a"), v.const(1.0))
    assert g.eval(c).tolist() == [1.0, 0.0, 0.0, 1.0, 0.0]
    sel = v.if_(g, v.const(10.0), v.int_field())
    assert sel.eval(c).tolist() == [10.0, 10.0, 0.0, 10.0, 100.0]
    # non-bool condition: floatVal != 0 (FunctionValues.boolVal default)
    sel2 = v.if_(v.term_freq("a"), v.const(1.0), v.const(2.0))
    assert sel2.eval(c).tolist() == [1.0, 2.0, 1.0, 1.0, 2.0]
