"""Unit tests for the platform bootstrap (relay probing, bounded waits)."""
import socket

import pytest

from demuxalot_tpu.utils import platform as plat


@pytest.fixture
def tunneled_env(monkeypatch):
    """Pretend to be the loopback-relay TPU environment."""
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("AXON_POOL_SVC_OVERRIDE", raising=False)
    monkeypatch.delenv("AXON_LOOPBACK_RELAY", raising=False)


def test_tunnel_expected_gates(monkeypatch, tunneled_env):
    assert plat._tunnel_expected()
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not plat._tunnel_expected()  # CPU forced: never probe
    monkeypatch.delenv("JAX_PLATFORMS")
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS")
    assert not plat._tunnel_expected()  # not a tunneled environment
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "10.0.0.1")
    monkeypatch.setenv("AXON_POOL_SVC_OVERRIDE", "10.1.2.3")
    assert not plat._tunnel_expected()  # client does not dial loopback


def test_wait_for_tunnel_not_expected(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    diag = plat.wait_for_tunnel(max_wait_s=60)
    assert diag == {"expected": False, "reachable": False, "waited_s": 0.0,
                    "ports": list(plat.RELAY_PORTS)}


def test_wait_for_tunnel_reachable_immediately(tunneled_env):
    # a real listener on an ephemeral port: the probe must connect
    server = socket.socket()
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    try:
        import demuxalot_tpu.utils.platform as p

        orig = p._probe_relay
        p._probe_relay = lambda ports=(port,), timeout_s=2.0: orig((port,), timeout_s)
        try:
            diag = p.wait_for_tunnel(max_wait_s=30)
        finally:
            p._probe_relay = orig
        assert diag["expected"] and diag["reachable"]
        assert diag["waited_s"] < 5
    finally:
        server.close()


def test_wait_for_tunnel_bounded_retry(monkeypatch, tunneled_env):
    """Dead relay: polls until the deadline, reports honest waited_s."""
    calls = []

    def fake_probe(ports=plat.RELAY_PORTS, timeout_s=2.0):
        calls.append(1)
        return False

    monkeypatch.setattr(plat, "_probe_relay", fake_probe)
    diag = plat.wait_for_tunnel(max_wait_s=0.5, poll_s=0.2)
    assert not diag["reachable"]
    assert diag["waited_s"] >= 0.5
    assert len(calls) >= 2  # retried, not a single-shot probe


def test_wait_for_tunnel_heals_mid_wait(monkeypatch, tunneled_env):
    """Relay returning during the wait flips the diagnosis to reachable."""
    state = {"n": 0}

    def flaky_probe(ports=plat.RELAY_PORTS, timeout_s=2.0):
        state["n"] += 1
        return state["n"] >= 3

    monkeypatch.setattr(plat, "_probe_relay", flaky_probe)
    diag = plat.wait_for_tunnel(max_wait_s=30, poll_s=0.05)
    assert diag["reachable"]
    assert state["n"] == 3
