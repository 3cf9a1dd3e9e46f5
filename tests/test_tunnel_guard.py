"""Unit tests for the bounded TPU-tunnel liveness guard (utils/tunnel.py).

Pure socket/subprocess logic — no jax device use, so these run in the
plain CPU test tier. Ports are per-test ephemeral listeners; no state
leaks into the axon relay's real ports.
"""

import socket
import subprocess

import pytest

from edtr_tpu.utils import tunnel


@pytest.fixture()
def listener():
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.bind(("127.0.0.1", 0))
    s.listen(1)
    yield s.getsockname()[1]
    s.close()


@pytest.fixture()
def refused_port():
    # bind-then-close: the port is free, so connecting is refused
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_cpu_request_passes_through(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("EDTR_AXON_PORTS", "1")  # would refuse if checked
    assert tunnel.ensure_tpu_reachable(max_wait_s=0) is True


def test_empty_port_list_passes_through(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("EDTR_AXON_PORTS", "")
    assert tunnel.ensure_tpu_reachable(max_wait_s=0) is True


def test_open_port_is_healthy(monkeypatch, listener):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("EDTR_AXON_PORTS", str(listener))
    assert tunnel.ensure_tpu_reachable(max_wait_s=0) is True


def test_one_open_port_suffices(monkeypatch, listener, refused_port):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("EDTR_AXON_PORTS", f"{refused_port},{listener}")
    assert tunnel.ensure_tpu_reachable(max_wait_s=0) is True


def test_refusal_then_subprocess_success_proceeds(monkeypatch, refused_port):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("EDTR_AXON_PORTS", str(refused_port))
    calls = {}

    def fake_run(cmd, **kw):
        calls["cmd"] = cmd
        return subprocess.CompletedProcess(cmd, 0, stdout="[TpuDevice(id=0)]",
                                           stderr="")

    monkeypatch.setattr(tunnel.subprocess, "run", fake_run)
    assert tunnel.ensure_tpu_reachable(max_wait_s=0) is True
    assert "jax.devices()" in calls["cmd"][-1]


def test_confirmed_outage_exits_nonzero(monkeypatch, refused_port, capsys):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("EDTR_AXON_PORTS", str(refused_port))

    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout", 0))

    monkeypatch.setattr(tunnel.subprocess, "run", fake_run)
    with pytest.raises(SystemExit) as exc:
        tunnel.ensure_tpu_reachable(max_wait_s=0)
    assert exc.value.code == 1
    err = capsys.readouterr().err
    assert "OUTAGE" in err and "hung past timeout" in err


def test_subprocess_failure_exits_with_stderr_tail(monkeypatch, refused_port,
                                                   capsys):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("EDTR_AXON_PORTS", str(refused_port))

    def fake_run(cmd, **kw):
        return subprocess.CompletedProcess(
            cmd, 1, stdout="",
            stderr="Traceback...\nRuntimeError: UNAVAILABLE: relay down")

    monkeypatch.setattr(tunnel.subprocess, "run", fake_run)
    with pytest.raises(SystemExit):
        tunnel.ensure_tpu_reachable(max_wait_s=0)
    assert "UNAVAILABLE: relay down" in capsys.readouterr().err
