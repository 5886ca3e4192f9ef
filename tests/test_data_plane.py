"""Backend-parametric DistribArray suite.

Mirrors the reference's data-plane tests (benchmark/pkg/data/data_test.go:
116-236 testDistribArr/testArrayFactory subtests — ReadWrite, ReRead,
ReOpen, MultipleArrays, Destroy — plus the pedantic reader EOF contracts,
data_test.go:39-65, and range-reader window tests incl. negative end,
mem_test.go:20-26), instantiated against all three backends via the
fixture-injection pattern of SURVEY.md §4.
"""

import numpy as np
import pytest

from gpu_radix_sort_tpu.data import (
    CapacityError,
    DeviceArrayFactory,
    FileArrayFactory,
    MemArrayFactory,
    create_shape,
    create_shape_uniform,
    fetch_part_refs,
    fetch_part_refs_u32,
    PartRef,
)


@pytest.fixture(params=["mem", "file", "device"])
def factory(request, tmp_path):
    if request.param == "mem":
        return MemArrayFactory()
    if request.param == "file":
        return FileArrayFactory(str(tmp_path / "arrays"))
    return DeviceArrayFactory()


def _random_parts(rng, caps):
    return [rng.integers(0, 256, size=c, dtype=np.uint8).tobytes() for c in caps]


def test_create_shape_validation():
    s = create_shape_uniform(16, 4)
    assert s.npart == 4 and s.caps == (16,) * 4 and s.lens == (0,) * 4
    assert s.starts() == (0, 16, 32, 48)
    with pytest.raises(ValueError):
        create_shape([-1])


def test_read_write(factory, rng):
    caps = [64, 0, 128]
    arr = factory.create("rw", create_shape(caps))
    parts = _random_parts(rng, caps)
    arr.write_all(parts)
    arr.close()
    shape = arr.get_shape()
    assert shape.lens == tuple(len(p) for p in parts)
    for i, p in enumerate(parts):
        assert arr.read_part(i) == p
    assert arr.read_all() == b"".join(parts)


def test_reread_is_independent(factory, rng):
    arr = factory.create("reread", create_shape_uniform(64, 1))
    data = _random_parts(rng, [64])[0]
    arr.write_part(0, data)
    arr.close()
    r1 = arr.get_part_reader(0)
    r2 = arr.get_part_reader(0)
    assert r1.read(10) == data[:10]
    assert r2.read() == data  # second reader unaffected by first's position
    assert r1.read() == data[10:]
    r1.close(), r2.close()


def test_reader_eof_contract(factory):
    arr = factory.create("eof", create_shape_uniform(8, 1))
    arr.write_part(0, b"abc")
    arr.close()
    r = arr.get_part_reader(0)
    assert r.read(2) == b"ab"
    assert r.read(100) == b"c"  # short read at tail
    assert r.read(1) == b""  # EOF is empty bytes, repeatedly
    assert r.read() == b""
    r.close()


def test_partial_append_then_more(factory):
    arr = factory.create("append", create_shape_uniform(10, 1))
    w = arr.get_part_writer(0)
    w.write(b"hello")
    w.close()
    arr.close()
    assert arr.read_part(0) == b"hello"
    arr.write_part(0, b"world")
    arr.close()
    assert arr.read_part(0) == b"helloworld"
    assert arr.get_shape().lens == (10,)


def test_capacity_overflow(factory):
    arr = factory.create("cap", create_shape_uniform(4, 1))
    with pytest.raises(CapacityError):
        arr.write_part(0, b"12345")
    arr.write_part(0, b"1234")
    arr.close()
    with pytest.raises(CapacityError):
        arr.write_part(0, b"x")


def test_range_reader_windows(factory):
    arr = factory.create("range", create_shape_uniform(16, 1))
    arr.write_part(0, b"0123456789")  # len 10, cap 16
    arr.close()
    with arr.get_part_range_reader(0, 2, 5) as r:
        assert r.read() == b"234"
    # end <= 0 is relative to committed LEN (canonicalized; the reference's
    # backends disagreed — mem.go:121-127 vs file.go:225-229).
    with arr.get_part_range_reader(0, 0, 0) as r:
        assert r.read() == b"0123456789"
    with arr.get_part_range_reader(0, 3, -2) as r:
        assert r.read() == b"34567"
    with pytest.raises(ValueError):
        arr.get_part_range_reader(0, 0, 11)
    with pytest.raises(ValueError):
        arr.get_part_range_reader(0, 5, 3)


def test_reopen_by_name(factory, rng):
    caps = [32, 32]
    arr = factory.create("reopen", create_shape(caps))
    parts = _random_parts(rng, caps)
    arr.write_all(parts)
    arr.close()
    again = factory.open("reopen")
    assert again.get_shape().lens == (32, 32)
    assert again.read_all() == b"".join(parts)


def test_multiple_arrays(factory, rng):
    a = factory.create("multi_a", create_shape_uniform(16, 2))
    b = factory.create("multi_b", create_shape_uniform(16, 2))
    pa = _random_parts(rng, [16, 16])
    pb = _random_parts(rng, [16, 16])
    a.write_all(pa), b.write_all(pb)
    a.close(), b.close()
    assert factory.open("multi_a").read_all() == b"".join(pa)
    assert factory.open("multi_b").read_all() == b"".join(pb)


def test_destroy_frees_name(factory):
    arr = factory.create("gone", create_shape_uniform(4, 1))
    arr.write_part(0, b"data")
    arr.close()
    arr.destroy()
    with pytest.raises(FileNotFoundError):
        factory.open("gone")
    arr2 = factory.create("gone", create_shape_uniform(4, 1))  # name reusable
    arr2.write_part(0, b"new!")
    arr2.close()
    assert factory.open("gone").read_part(0) == b"new!"


def test_open_missing(factory):
    with pytest.raises(FileNotFoundError):
        factory.open("never_created")


def test_duplicate_create(factory):
    factory.create("dup", create_shape_uniform(4, 1))
    with pytest.raises(FileExistsError):
        factory.create("dup", create_shape_uniform(4, 1))


def test_fetch_part_refs(factory, rng):
    """Multi-array multi-range gather (reference: helpers_test.go:9-56)."""
    a = factory.create("fetch_a", create_shape_uniform(32, 2))
    b = factory.create("fetch_b", create_shape_uniform(32, 1))
    pa = _random_parts(rng, [32, 32])
    pb = _random_parts(rng, [32])
    a.write_all(pa), b.write_all(pb)
    a.close(), b.close()
    refs = [
        PartRef(a, 0, 4, 8),
        PartRef(b, 0, 0, 32),
        PartRef(a, 1, 28, 4),
    ]
    got = fetch_part_refs(refs)
    assert bytes(got) == pa[0][4:12] + pb[0] + pa[1][28:32]


def test_fetch_part_refs_u32(factory):
    arr = factory.create("fetch_u32", create_shape_uniform(16, 1))
    keys = np.array([7, 1, 9, 3], dtype=np.uint32)
    arr.write_part(0, keys.tobytes())
    arr.close()
    got = fetch_part_refs_u32([PartRef(arr, 0, 0, 16)])
    np.testing.assert_array_equal(got, keys)
    with pytest.raises(ValueError):
        fetch_part_refs_u32([PartRef(arr, 0, 0, 6)])


def test_file_format_is_reference_compatible(tmp_path):
    """The on-disk layout is the reference wire protocol: meta.json with
    Lens/Caps keys, data.dat with partitions at starts[i]=sum(caps[:i])
    (file.go:36-52,146-160 / data.py:122-131)."""
    import json
    import os

    root = str(tmp_path / "wire")
    f = FileArrayFactory(root)
    arr = f.create("wire_arr", create_shape([8, 16]))
    arr.write_part(0, b"AAAA")
    arr.write_part(1, b"BBBBBBBB")
    arr.close()
    d = os.path.join(root, "wire_arr")
    meta = json.load(open(os.path.join(d, "meta.json")))
    assert meta == {"Lens": [4, 8], "Caps": [8, 16]}
    raw = open(os.path.join(d, "data.dat"), "rb").read()
    assert len(raw) == 24  # preallocated to total cap
    assert raw[0:4] == b"AAAA" and raw[8:16] == b"BBBBBBBB"


def test_device_put_device_part():
    """Device backend's zero-host-copy write path."""
    import jax
    import jax.numpy as jnp

    f = DeviceArrayFactory()
    arr = f.create("dev_direct", create_shape_uniform(16, 1))
    dev = jax.device_put(jnp.arange(8, dtype=jnp.uint8))
    arr.put_device_part(0, dev)
    arr.close()
    assert arr.read_part(0) == bytes(range(8))
    assert arr.device_slice(0) is dev


def test_device_put_device_packed():
    """Packed commit: all partitions as views over one u8 backing."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from gpu_radix_sort_tpu.data.interface import CapacityError

    f = DeviceArrayFactory()
    arr = f.create("dev_packed", create_shape([8, 0, 12]))
    backing = jax.device_put(jnp.arange(20, dtype=jnp.uint8))
    arr.put_device_packed(backing, [8, 0, 12])
    arr.close()
    assert list(arr.get_shape().lens) == [8, 0, 12]
    assert arr.read_part(0) == bytes(range(8))
    assert arr.read_part(1) == b""
    assert arr.read_part(2) == bytes(range(8, 20))
    # device_range windows (zero-host-copy fetch path)
    win = np.asarray(jax.device_get(arr.device_range(2, 4, 6)))
    assert win.tobytes() == bytes(range(12, 18))
    # packed arrays are immutable afterwards
    with _pytest.raises(IOError):
        arr.write_part(0, b"x")
    with _pytest.raises(IOError):
        arr.put_device_packed(backing, [8, 0, 12])
    # capacity enforced
    arr2 = f.create("dev_packed2", create_shape([4]))
    with _pytest.raises(CapacityError):
        arr2.put_device_packed(backing, [20])
    # lens must cover the backing exactly
    arr3 = f.create("dev_packed3", create_shape([64]))
    with _pytest.raises(ValueError):
        arr3.put_device_packed(backing, [8])
