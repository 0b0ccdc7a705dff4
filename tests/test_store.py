"""gmmstore round-trip: writer + native C++ reader + Python fallback."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gridmm_tpu.data.store import (NativeStoreReader, PyStoreReader,  # noqa: E402
                                   open_store, write_store)


@pytest.fixture(scope="module")
def store_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    records = {
        f"scan{i//3:02d}_vp{i:03d}": rng.standard_normal(
            (12, 50, 32)).astype(np.float16)
        for i in range(10)
    }
    path = tmp_path_factory.mktemp("store") / "grid.gmm"
    write_store(str(path), records)
    return str(path), records


def test_python_reader(store_file):
    path, records = store_file
    r = PyStoreReader(path)
    assert len(r) == 10
    assert r.shape == (12, 50, 32) and r.dtype == np.float16
    for k, v in records.items():
        np.testing.assert_array_equal(r.get(k), v)
    with pytest.raises(KeyError):
        r.get("nope")
    r.close()


def test_native_reader(store_file):
    path, records = store_file
    try:
        r = NativeStoreReader(path)
    except RuntimeError:
        pytest.skip("native toolchain unavailable")
    assert len(r) == 10
    r.prefetch(list(records)[:5])
    for k, v in records.items():
        np.testing.assert_array_equal(r.get(k), v)
    r.close()


def test_open_store_prefers_native(store_file):
    path, records = store_file
    r = open_store(path)
    np.testing.assert_array_equal(
        r.get("scan00_vp000"), records["scan00_vp000"])
    r.close()
