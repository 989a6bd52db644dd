import numpy as np

from vs_seg_tpu.data import nifti
from vs_seg_tpu.native.decoder import (convert_to_float32, native_available,
                                       read_file_bytes)


def test_native_compiles_and_reads_gz(tmp_path, rng):
    assert native_available(), "g++/zlib native decoder failed to build"
    data = rng.normal(size=(9, 7, 5)).astype(np.float32)
    path = str(tmp_path / "vol.nii.gz")
    nifti.save(nifti.NiftiImage(data, np.eye(4)), path)
    raw = read_file_bytes(path)
    assert raw is not None
    # same bytes the python gzip path produces
    import gzip
    with gzip.open(path, "rb") as f:
        assert raw == f.read()
    # full load goes through the native path and round-trips
    img = nifti.load(path)
    np.testing.assert_allclose(img.data, data, rtol=1e-6)


def test_native_uncompressed_passthrough(tmp_path, rng):
    data = rng.integers(0, 255, size=(4, 4, 4)).astype(np.uint8)
    path = str(tmp_path / "vol.nii")
    nifti.save(nifti.NiftiImage(data, np.eye(4)), path)
    raw = read_file_bytes(path)
    with open(path, "rb") as f:
        assert raw == f.read()


def test_native_dtype_conversion(rng):
    if not native_available():
        return
    src = rng.integers(-1000, 1000, size=100).astype("<i2")
    out = convert_to_float32(src.tobytes(), 100, 4, 2.0, 5.0)
    np.testing.assert_allclose(out, src.astype(np.float32) * 2.0 + 5.0)
