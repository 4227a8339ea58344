"""Native I/O core: build, parallel-read equivalence with numpy, and
graceful fallback on malformed files."""

from pathlib import Path

import numpy as np
import pytest

from py4cast_tpu.native import native_available, read_npy_float32_batch


@pytest.fixture(scope="module")
def npy_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("npys")
    rng = np.random.default_rng(0)
    arrays = [rng.standard_normal((12, 17)).astype(np.float32) for _ in range(32)]
    paths = []
    for i, a in enumerate(arrays):
        p = d / f"f{i}.npy"
        np.save(p, a)
        paths.append(p)
    return paths, arrays


def test_native_builds():
    assert native_available(), "C++ I/O core failed to build/load"


def test_batch_read_matches_numpy(npy_files):
    paths, arrays = npy_files
    out = read_npy_float32_batch(paths, (12, 17))
    np.testing.assert_array_equal(out, np.stack(arrays))


def test_fallback_on_non_float32(tmp_path):
    # a float64 file is rejected by the native reader and must fall back
    p = tmp_path / "f64.npy"
    arr = np.arange(6, dtype=np.float64).reshape(2, 3)
    np.save(p, arr)
    with pytest.warns(UserWarning, match="falling back"):
        out = read_npy_float32_batch([p], (2, 3))
    np.testing.assert_array_equal(out[0], arr.astype(np.float32))


def test_native_is_at_least_as_fast(npy_files):
    """Smoke perf check on many small files (not a strict benchmark)."""
    import time

    paths, _ = npy_files
    paths = paths * 8  # 256 reads
    t0 = time.perf_counter()
    read_npy_float32_batch(paths, (12, 17))
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.stack([np.load(p) for p in paths])
    t_numpy = time.perf_counter() - t0
    # allow generous slack — this guards against pathological regressions only
    assert t_native < t_numpy * 3


def test_stale_abi_rebuilds_not_crashes(tmp_path, monkeypatch):
    """ADVICE r3 (medium): a stale .so from an older ABI — possibly
    missing today's symbols entirely — must take the rebuild path, not
    crash the first data read with AttributeError. Simulated with a
    stub .so exporting only p4t_version()==2."""
    import shutil
    import subprocess

    import py4cast_tpu.native as native

    d = tmp_path / "native"
    d.mkdir()
    repo = Path(__file__).resolve().parents[1]
    shutil.copy(repo / "native" / "p4t_io.cpp", d / "p4t_io.cpp")
    shutil.copy(repo / "native" / "Makefile", d / "Makefile")
    stub = d / "stub.cpp"
    stub.write_text('extern "C" int p4t_version() { return 2; }\n')
    subprocess.run(
        ["g++", "-O1", "-std=c++17", "-fPIC", "-shared", "-o",
         str(d / "libp4tio.so"), str(stub)],
        check=True,
    )
    monkeypatch.setattr(native, "_NATIVE_DIR", d)
    monkeypatch.setattr(native, "_LIB_PATH", d / "libp4tio.so")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    assert native.native_available(), "stale-ABI .so was not rebuilt"
    assert native._lib.p4t_version() == native._ABI_VERSION

    # and a symbol-less pre-versioning stub takes the same path
    stub.write_text('extern "C" int p4t_unrelated() { return 0; }\n')
    subprocess.run(
        ["g++", "-O1", "-std=c++17", "-fPIC", "-shared", "-o",
         str(d / "libp4tio.so"), str(stub)],
        check=True,
    )
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", False)
    assert native.native_available()


def test_shape_mismatch_raises_not_silent(tmp_path):
    """ADVICE r2: a file whose shape differs from the probed batch shape
    must raise (or fall back and raise), never silently fill the buffer
    with truncated data."""
    good = tmp_path / "good.npy"
    big = tmp_path / "big.npy"
    np.save(good, np.zeros((2, 3), np.float32))
    # MORE elements than expected: byte-count reads would succeed silently
    np.save(big, np.ones((4, 3), np.float32))
    with pytest.raises(ValueError, match="shape mismatch"):
        with pytest.warns(UserWarning, match="falling back"):
            read_npy_float32_batch([good, big], (2, 3))


def test_transposed_shape_raises_not_silent(tmp_path):
    """Same ELEMENT COUNT but different dims: the native reader must
    reject per-dim (a (3,2) file would pass an element-count-only check
    and silently fill a (2,3) slot with transposed data)."""
    good = tmp_path / "good.npy"
    tr = tmp_path / "transposed.npy"
    np.save(good, np.zeros((2, 3), np.float32))
    np.save(tr, np.arange(6, dtype=np.float32).reshape(3, 2))
    with pytest.raises(ValueError, match="shape mismatch"):
        with pytest.warns(UserWarning, match="falling back"):
            read_npy_float32_batch([good, tr], (2, 3))
