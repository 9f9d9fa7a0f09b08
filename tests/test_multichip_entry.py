"""Driver contract: dryrun_multichip must self-provision a virtual mesh.

Round 1 shipped MULTICHIP_r01.json ok=false because the driver process came
up with a single device and __graft_entry__ asserted instead of provisioning.
These tests simulate exactly that environment (a fresh process with ONE jax
device) and require the dry run to succeed by re-execing onto a virtual
CPU mesh.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_like_env():
    """A process env with a single CPU device (no forced device count)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env.pop("_CGVAE_DRYRUN_SUBPROCESS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cgvae_tpu_xla_cache")
    # the contract under test is mesh self-provisioning; skip the
    # flagship-shape steps (minutes of CPU compile the DRIVER still runs)
    env["CGVAE_DRYRUN_FLAGSHIP"] = "0"
    return env


def test_dryrun_multichip_self_provisions_mesh():
    """dryrun_multichip(4) from a 1-device process must pass (driver path)."""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; assert len(jax.devices()) == 1, jax.devices(); "
            "import __graft_entry__ as g; g.dryrun_multichip(4)",
        ],
        cwd=REPO,
        env=_driver_like_env(),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "dryrun_multichip(4) ok" in proc.stdout, proc.stdout[-4000:]


def test_dryrun_parent_decision_touches_no_jax(monkeypatch):
    """The parent-side relaunch decision must not touch jax AT ALL.

    Under the driver, the parent process's jax initializes the tunneled axon
    TPU plugin; when the tunnel is wedged that init hangs indefinitely
    (round-4 MULTICHIP artifact: rc=124, tail = plugin warning only). The
    decision must therefore be env-only: _CGVAE_DRYRUN_SUBPROCESS unset ->
    always relaunch, no jax import/call in the parent.
    """
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)

    calls = []
    monkeypatch.setattr(g, "_relaunch_dryrun", lambda n: calls.append(n))
    monkeypatch.delenv("_CGVAE_DRYRUN_SUBPROCESS", raising=False)

    class _PoisonJax:
        def __getattr__(self, name):
            raise AssertionError(f"parent path touched jax.{name}")

    monkeypatch.setitem(sys.modules, "jax", _PoisonJax())
    g.dryrun_multichip(8)
    assert calls == [8]


def test_subprocess_body_raises_cpu_collective_deadlines(monkeypatch):
    """The dryrun subprocess must inject raised rendezvous deadlines.

    XLA's in-process CPU collectives SIGABRT (rendezvous.cc termination
    timeout, hard 40 s) when the virtual devices' threads are time-sliced on
    a starved/few-core host -- observed killing the flagship-shape steps on
    a 1-core VM. The fix routes per-jit DebugOptions through a jax.jit wrap;
    pin that every jit call gets the two timeout fields (and that caller
    compiler_options are merged, not clobbered).
    """
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)

    captured = []

    class _FakeJax:
        @staticmethod
        def jit(*args, **kwargs):
            captured.append(kwargs.get("compiler_options"))
            return lambda *a, **k: None

    monkeypatch.setitem(sys.modules, "jax", _FakeJax())
    g._raise_cpu_collective_deadlines()
    fake = sys.modules["jax"]
    fake.jit(lambda x: x, donate_argnums=(0,))
    fake.jit(lambda x: x, compiler_options={"xla_foo": 1})
    assert captured[0] == {
        "xla_cpu_collective_call_warn_stuck_seconds": 120,
        "xla_cpu_collective_call_terminate_timeout_seconds": 1200,
    }
    assert captured[1]["xla_foo"] == 1
    assert (
        captured[1]["xla_cpu_collective_call_terminate_timeout_seconds"]
        == 1200
    )


def test_dryrun_multichip_propagates_failure():
    """A failing subprocess body must surface as a nonzero rc, not silence."""
    env = _driver_like_env()
    # poison the subprocess re-exec: claim we're already in the subprocess
    # while only 1 device exists -> the body's device assert must fire and
    # the failure must propagate out as a nonzero exit code.
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import os; os.environ['_CGVAE_DRYRUN_SUBPROCESS'] = '1'; "
            "import __graft_entry__ as g; g.dryrun_multichip(4)",
        ],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=300,
    )
    assert proc.returncode != 0
    assert "need 4 devices" in proc.stdout
