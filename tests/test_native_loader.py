"""Native C++ data loader: build, decode correctness, prefetch ordering."""

import numpy as np
import pytest

from pli_slam_tpu.utils import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native toolchain/libpng unavailable"
)


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr.astype(np.uint8), mode="L").save(path)


def test_decode_matches_pillow(tmp_path, rng):
    arr = rng.integers(0, 255, size=(48, 64)).astype(np.uint8)
    p = str(tmp_path / "img.png")
    _write_png(p, arr)
    out = native_loader.decode_png(p)
    assert out is not None and out.shape == (48, 64)
    np.testing.assert_array_equal(out.astype(np.uint8), arr)


def test_prefetcher_streams_in_order(tmp_path, rng):
    n = 12
    lefts, rights = [], []
    truth = []
    for i in range(n):
        l = np.full((32, 40), i * 3, np.uint8)
        r = np.full((32, 40), i * 3 + 1, np.uint8)
        lp = str(tmp_path / f"l{i}.png")
        rp = str(tmp_path / f"r{i}.png")
        _write_png(lp, l)
        _write_png(rp, r)
        lefts.append(lp)
        rights.append(rp)
        truth.append((l, r))
    pf = native_loader.StereoPrefetcher(lefts, rights, 40, 32, n_workers=3, ring=4)
    assert len(pf) == n
    for i, (l, r) in enumerate(pf):
        np.testing.assert_array_equal(l.astype(np.uint8), truth[i][0])
        np.testing.assert_array_equal(r.astype(np.uint8), truth[i][1])
    pf.close()


def test_prefetcher_rejects_mismatched_lists(tmp_path):
    with pytest.raises(RuntimeError):
        native_loader.StereoPrefetcher(["a.png"], [], 10, 10)
