"""Native C++ data-loading core: build, parity with Python paths, speed."""

import numpy as np
import pytest

from socialways_tpu.native.loader import get_lib, parse_table, window_indices


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native lib unavailable (no g++)")


def test_parse_table_matches_loadtxt(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randn(500, 8)
    f = tmp_path / "t.txt"
    np.savetxt(f, arr)
    got = parse_table(str(f))
    np.testing.assert_allclose(got, arr, rtol=1e-12)


def test_parse_table_skips_junk(tmp_path):
    f = tmp_path / "j.txt"
    f.write_text("# comment\n1 2 3\ngarbage line\n4 5 6\n7 8\n9 10 11\n")
    got = parse_table(str(f))
    np.testing.assert_allclose(got, [[1, 2, 3], [4, 5, 6], [9, 10, 11]])


def test_parse_table_tabs(tmp_path):
    f = tmp_path / "t.txt"
    f.write_text("1.5\t2.5\n3.5\t4.5\n")
    got = parse_table(str(f), delim="\t")
    np.testing.assert_allclose(got, [[1.5, 2.5], [3.5, 4.5]])


def test_parse_table_missing_file():
    with pytest.raises(ValueError):
        parse_table("/nonexistent/file.txt")


def test_window_indices_native_equals_python(monkeypatch):
    rng = np.random.RandomState(1)
    t_data = []
    for _ in range(20):
        start = rng.randint(0, 50)
        length = rng.randint(5, 60)
        t_data.append(np.arange(start, start + length * 2, 2))
    args = (t_data, 0, 160, 2, 8, 12)

    native = window_indices(*args)

    import socialways_tpu.native.loader as L
    monkeypatch.setattr(L, "get_lib", lambda: None)
    python = L.window_indices(*args)
    np.testing.assert_array_equal(native, python)
    assert native.shape[0] > 0


def test_parser_native_equals_python(tmp_path):
    from socialways_tpu.data import BIWIParser

    rows = []
    rng = np.random.RandomState(2)
    for aid in range(1, 9):
        for k in range(40):
            t = 10 * k
            rows.append((t, aid, rng.randn(), 0.0, rng.randn(), 0.1, 0.0,
                         -0.1))
    rows.sort()
    txt = "\n".join(" ".join(f"{v:.6f}" for v in r) for r in rows) + "\n"
    (tmp_path / "obsmat.txt").write_text(txt)

    pn = BIWIParser()
    pn.load(str(tmp_path / "obsmat.txt"), native=True)
    pp = BIWIParser()
    pp.load(str(tmp_path / "obsmat.txt"), native=False)

    assert pn.all_ids == pp.all_ids
    assert pn.interval == pp.interval
    assert len(pn.p_data) == len(pp.p_data)
    for a, b in zip(pn.p_data, pp.p_data):
        np.testing.assert_allclose(a, b, rtol=1e-6)
    for a, b in zip(pn.t_data, pp.t_data):
        np.testing.assert_array_equal(a, b)
    assert pn.scale.sx == pytest.approx(pp.scale.sx)
