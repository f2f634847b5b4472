"""Native C++ loader vs the pure-Python parser."""

import numpy as np
import pytest

from kb2e_tpu.data import native, vocab
from kb2e_tpu.data import triples as T


def test_native_loader_matches_python(tiny_kg_dir):
    if not native.available():
        pytest.skip("native loader could not be built in this environment")
    import os

    e2i = vocab.load_id_file(os.path.join(tiny_kg_dir, "entity2id.txt"))
    r2i = vocab.load_id_file(os.path.join(tiny_kg_dir, "relation2id.txt"))
    path = os.path.join(tiny_kg_dir, "train.txt")
    ph, pt, pr = T.load_triple_file(path, e2i, r2i)
    nh, nt, nr = native.load_triple_file(path, e2i, r2i)
    np.testing.assert_array_equal(ph, nh)
    np.testing.assert_array_equal(pt, nt)
    np.testing.assert_array_equal(pr, nr)


def test_native_loader_skips_unknown(tmp_path):
    if not native.available():
        pytest.skip("native loader could not be built in this environment")
    (tmp_path / "entity2id.txt").write_text("a\t0\nb\t1\n")
    (tmp_path / "relation2id.txt").write_text("likes\t0\n")
    (tmp_path / "train.txt").write_text("a\tb\tlikes\nzzz\tb\tlikes\n")
    h, t, r = native.load_triple_file(str(tmp_path / "train.txt"), {"a": 0, "b": 1}, {"likes": 0})
    assert h.tolist() == [0] and t.tolist() == [1] and r.tolist() == [0]
