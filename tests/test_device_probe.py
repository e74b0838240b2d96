"""Non-blocking device gate semantics (device.py / Stitcher._device_ok).

The pipeline must never spend wall-clock waiting on the chip-link probe:
while the probe is pending, work runs natively; once it resolves healthy,
later gaps route to the device; an unhealthy verdict pins the native path.
"""

import threading
import time

import pytest

from centrolign_tpu import device
from centrolign_tpu.stitcher import Stitcher


@pytest.fixture(autouse=True)
def _reset_device_state(monkeypatch):
    monkeypatch.setattr(device, "_healthy", None)
    monkeypatch.setattr(device, "_async_thread", None)
    monkeypatch.delenv("CENTROLIGN_TPU_USE_DEVICE", raising=False)
    yield


def test_device_ready_does_not_block_on_pending_probe(monkeypatch):
    release = threading.Event()

    def slow_probe():
        release.wait(10)
        return True

    monkeypatch.setattr(device, "_probe", slow_probe)
    t0 = time.perf_counter()
    assert device.device_ready() is False   # kicks the probe off async
    assert device.probe_resolved() is False
    assert time.perf_counter() - t0 < 1.0, "device_ready blocked"
    release.set()
    device._async_thread.join(10)
    assert device.device_ready() is True
    assert device.probe_resolved() is True


def test_device_ready_env_modes(monkeypatch):
    monkeypatch.setenv("CENTROLIGN_TPU_USE_DEVICE", "0")
    assert device.device_ready() is False
    assert device.probe_resolved() is True
    monkeypatch.setenv("CENTROLIGN_TPU_USE_DEVICE", "force")
    assert device.device_ready() is True
    assert device.probe_resolved() is True


def test_stitcher_gate_pending_then_healthy(monkeypatch):
    release = threading.Event()
    monkeypatch.setattr(device, "_probe",
                        lambda: (release.wait(10), True)[1])
    st = Stitcher()
    assert st._device_ok() is False        # pending: run natively
    assert st.use_device, "pending probe must not disable the device"
    release.set()
    device._async_thread.join(10)
    assert st._device_ok() is True         # verdict in: route to chip


def test_stitcher_gate_unhealthy_pins_native(monkeypatch):
    monkeypatch.setattr(device, "_probe", lambda: False)
    st = Stitcher()
    assert st._device_ok() is False
    device._async_thread.join(10)
    assert st._device_ok() is False
    assert st.use_device is False, \
        "unhealthy verdict should stop further re-checking"
