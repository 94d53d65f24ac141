"""Native batch loader: build, determinism, epoch coverage, fallback parity."""

import numpy as np
import pytest

from equiadapt_tpu.native import (
    NativeBatchLoader,
    native_available,
    write_record_file,
)


@pytest.fixture()
def record_file(tmp_path):
    rng = np.random.default_rng(0)
    arrays = {
        "image": rng.normal(size=(64, 8, 8, 3)).astype(np.float32),
        "label": rng.integers(0, 10, size=(64,)).astype(np.int32),
    }
    path = str(tmp_path / "data.bin")
    spec = write_record_file(path, arrays)
    return path, spec, arrays


def test_native_builds():
    assert native_available(), "g++ build of libeqt_loader.so failed"


def test_batches_cover_epoch_and_match_source(record_file):
    path, spec, arrays = record_file
    loader = NativeBatchLoader(path, spec, batch_size=16, num_threads=2, seed=1)
    seen_labels = []
    for _ in range(4):  # one epoch = 64/16 batches
        b = loader.next()
        assert b["image"].shape == (16, 8, 8, 3)
        assert b["label"].shape == (16,)
        # every record must exist in the source (match by content)
        for img, lab in zip(b["image"], b["label"]):
            matches = np.where(
                np.all(np.isclose(arrays["image"], img), axis=(1, 2, 3))
            )[0]
            assert len(matches) >= 1
            assert lab in arrays["label"][matches]
            seen_labels.append(int(lab))
    loader.close()
    # a full epoch touches each record exactly once
    assert len(seen_labels) == 64


def test_deterministic_given_seed(record_file):
    path, spec, _ = record_file
    a = NativeBatchLoader(path, spec, batch_size=8, num_threads=1, seed=7)
    b = NativeBatchLoader(path, spec, batch_size=8, num_threads=3, seed=7)
    for _ in range(3):
        x, y = a.next(), b.next()
        np.testing.assert_array_equal(x["label"], y["label"])
    a.close()
    b.close()


def test_numpy_fallback_contract(record_file, monkeypatch):
    path, spec, arrays = record_file
    import equiadapt_tpu.native.loader as L

    monkeypatch.setattr(L, "_load_lib", lambda: None)
    loader = L.NativeBatchLoader(path, spec, batch_size=16, seed=1)
    assert loader._handle is None
    b = loader.next()
    assert b["image"].shape == (16, 8, 8, 3)
