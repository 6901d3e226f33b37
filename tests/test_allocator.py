"""Page allocator: native (C++) and Python backends must agree."""

import numpy as np
import pytest

from tpu_flash.cache.allocator import PageAllocator


@pytest.fixture(params=[False, True], ids=["native", "python"])
def make_alloc(request):
    force_python = request.param

    def _make(**kw):
        a = PageAllocator(force_python=force_python, **kw)
        if not force_python and not a.native:
            pytest.skip("native pagepool unavailable")
        return a

    return _make


def test_admit_extend_free(make_alloc):
    a = make_alloc(total_pages=10, max_seqs=4, max_pages_per_seq=8)
    assert a.num_free() == 10
    assert a.admit(0, 3)
    assert a.num_free() == 7
    assert a.num_pages(0) == 3
    t = a.table(0)
    assert len(set(t[:3])) == 3
    page = a.extend(0)
    assert page is not None
    assert a.num_pages(0) == 4
    a.free_seq(0)
    assert a.num_free() == 10


def test_all_or_nothing_admission(make_alloc):
    a = make_alloc(total_pages=4, max_seqs=4, max_pages_per_seq=8)
    assert a.admit(0, 3)
    assert not a.admit(1, 2)  # only 1 page left
    assert a.num_free() == 1  # failed admit must not leak pages
    assert a.admit(1, 1)


def test_decode_reserve_watermark(make_alloc):
    a = make_alloc(total_pages=8, max_seqs=4, max_pages_per_seq=8, decode_reserve=2)
    assert a.admit(0, 6)
    assert not a.admit(1, 1)  # would dip into the decode reserve
    # ...but decode extends may use the reserve:
    assert a.extend(0) is not None
    assert a.extend(0) is not None
    assert a.extend(0) is None  # pool truly empty


def test_double_admit_rejected(make_alloc):
    a = make_alloc(total_pages=8, max_seqs=2, max_pages_per_seq=4)
    assert a.admit(0, 2)
    assert not a.admit(0, 1)


def test_page_cap(make_alloc):
    a = make_alloc(total_pages=100, max_seqs=1, max_pages_per_seq=2)
    assert a.admit(0, 2)
    assert a.extend(0) is None  # at per-seq cap


def test_no_page_reuse_across_active_slots(make_alloc):
    a = make_alloc(total_pages=16, max_seqs=4, max_pages_per_seq=8)
    assert a.admit(0, 4)
    assert a.admit(1, 4)
    t0, t1 = set(a.table(0)[:4].tolist()), set(a.table(1)[:4].tolist())
    assert not (t0 & t1)


def test_native_backend_loads():
    a = PageAllocator(total_pages=4, max_seqs=1, max_pages_per_seq=4)
    assert a.native, "C++ pagepool should build in this environment"
