"""Native C++ chain codec parity with the python codec."""

import io
import os

import numpy as np
import pytest

from genomealignmenttools_tpu.formats import chain as cf
from genomealignmenttools_tpu.native import chain_io, get_lib


@pytest.fixture(scope="module")
def native_lib():
    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


def test_native_parse_matches_python(native_lib, fixtures_dir):
    data = open(os.path.join(fixtures_dir, "synthetic.chain"), "rb").read()
    native = chain_io.parse_chain_text(data)
    py = cf._read_chains_stream(io.StringIO(data.decode()))
    assert len(native) == len(py)
    for a, b in zip(native, py):
        assert a.header_line() == b.header_line()
        assert np.array_equal(a.blocks, b.blocks)


def test_native_serialize_matches_python(native_lib, fixtures_dir):
    data = open(os.path.join(fixtures_dir, "synthetic.chain"), "rb").read()
    py = cf._read_chains_stream(io.StringIO(data.decode()))
    blob = chain_io.serialize_chains(py)
    assert blob == "".join(c.to_text() for c in py).encode()
    # round trip through the file is byte-identical to the input
    assert blob == data


def test_native_parse_error_reporting(native_lib):
    with pytest.raises(ValueError):
        chain_io.parse_chain_text(b"chain notascore chrA x + 0 1 q 5 + 0 1 1\n1\n")
