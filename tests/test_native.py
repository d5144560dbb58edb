"""Native runtime tests: C++ ring buffer, UDP sample pipe, TTI clock."""

import numpy as np
import pytest

from srslte_tpu.runtime import (NativeRingBuffer, SamplePipeRx, SamplePipeTx,
                                TtiClock)


def test_ring_buffer_roundtrip():
    rb = NativeRingBuffer(1024)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(300) + 1j * rng.standard_normal(300)).astype(np.complex64)
    assert rb.write(x) == 300
    assert rb.size == 300
    y = rb.read(300)
    np.testing.assert_allclose(y, x, rtol=1e-6)
    assert rb.size == 0
    # wrap-around across the capacity boundary
    for _ in range(5):
        assert rb.write(x) == 300
        np.testing.assert_allclose(rb.read(300), x, rtol=1e-6)
    rb.close()


def test_ring_buffer_overflow_drops():
    rb = NativeRingBuffer(100)
    x = np.ones(150, np.complex64)
    assert rb.write(x) == 100
    assert rb.size == 100
    rb.close()


def test_udp_sample_pipe_loopback():
    port = 45678
    rx = SamplePipeRx(port, capacity=1 << 16)
    tx = SamplePipeTx("127.0.0.1", port)
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(10_000) + 1j * rng.standard_normal(10_000)
         ).astype(np.complex64)
    assert tx.send(x) == 10_000
    y = rx.read(10_000, timeout_ms=2000)
    assert len(y) == 10_000
    np.testing.assert_allclose(y, x, rtol=1e-6)
    tx.close()
    rx.close()


def test_tti_clock_ticks_and_wait():
    clk = TtiClock(interval_us=1000)
    start = clk.now
    got = clk.wait(start + 5, timeout_ms=1000)
    assert got >= start + 5
    clk.close()
