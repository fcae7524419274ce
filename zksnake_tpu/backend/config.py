"""Backend configuration: device selection and dispatch thresholds.

The TPU path activates automatically when JAX is importable and not disabled
via ZKSNAKE_TPU_DISABLE=1. Small inputs stay on the host bigint path (device
round-trip latency dominates below the threshold).
"""

import os

_DISABLE = os.environ.get("ZKSNAKE_TPU_DISABLE", "0") == "1"

# Below these sizes the host path wins on latency.
MSM_DEVICE_THRESHOLD = int(os.environ.get("ZKSNAKE_MSM_THRESHOLD", "256"))
BATCHMUL_DEVICE_THRESHOLD = int(os.environ.get("ZKSNAKE_BATCHMUL_THRESHOLD", "64"))
NTT_DEVICE_THRESHOLD = int(os.environ.get("ZKSNAKE_NTT_THRESHOLD", "512"))
PLONK_DEVICE_THRESHOLD = int(os.environ.get("ZKSNAKE_PLONK_THRESHOLD", "2048"))
MLE_DEVICE_THRESHOLD = int(os.environ.get("ZKSNAKE_MLE_THRESHOLD", "4096"))

_jax_state = {"checked": False, "available": False}


from dataclasses import dataclass


@dataclass(frozen=True)
class MeshConfig:
    """Topology / kernel-shape configuration for multi-chip runs (SURVEY.md
    section 5: the reference's only knob is ZKSNAKE_PARALLEL_CPU; the rebuild
    makes mesh and kernel geometry explicit). Constructor-arg style, with env
    fallbacks for the driver."""

    n_devices: int = 0  # 0 = all visible devices
    axis: str = "shards"
    msm_window: int = 0  # 0 = auto (_pick_window)
    ntt_rows: int = 0  # four-step n1; 0 = sqrt(n) rounded to the mesh

    @classmethod
    def from_env(cls):
        return cls(
            n_devices=int(os.environ.get("ZKSNAKE_MESH_DEVICES", "0")),
            axis=os.environ.get("ZKSNAKE_MESH_AXIS", "shards"),
            msm_window=int(os.environ.get("ZKSNAKE_MSM_WINDOW", "0")),
            ntt_rows=int(os.environ.get("ZKSNAKE_NTT_ROWS", "0")),
        )

    def make_mesh(self):
        from .sharding import make_mesh

        return make_mesh(
            n_devices=self.n_devices or None, axis=self.axis
        )

CACHE_DIR = os.environ.get(
    "ZKSNAKE_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")
)

# XLA:CPU flags for every CPU-backend compile in this codebase (all
# orchestrated entry points — conftest, bench.py, the multichip dryrun —
# must agree on them: they are part of XLA's cache key).
#
# --xla_cpu_max_isa=AVX2: without the cap, XLA:CPU AOT cache entries embed
#   avx512-era tuning pseudo-features (+prefer-no-gather/-scatter) that
#   cpu_aot_loader rejects against the REAL host feature list — even on the
#   machine that WROTE the entry (reproduced on jax 0.9.0: a fresh entry
#   warns and recompiles on the very next run). That made warm replay of
#   every CPU-mesh graph a silent full recompile, which is what actually
#   ate the round-2/3/4 multichip dryrun budgets (the round-4 cpuinfo
#   fingerprint provably matched and the grind persisted — MULTICHIP_r04).
#   Capping at AVX2 keeps compile features a subset of any modern x86 host,
#   so entries replay everywhere.
# --xla_cpu_use_fusion_emitters=false: under the AVX2 cap the new fusion
#   emitters hit pathological LLVM codegen on the big fused u64-montmul
#   loops — the G2 fixed-base build module compiled >50 min (vs 149 s
#   uncapped). The legacy emitters compile the same module in 209 s under
#   AVX2 and the entries still replay cleanly (measured 2026-08-21).
CPU_MAX_ISA_FLAG = "--xla_cpu_max_isa=AVX2"
CPU_XLA_FLAGS = (
    "--xla_cpu_max_isa=AVX2 --xla_cpu_use_fusion_emitters=false"
)
# bump when the required cache entry format changes incompatibly; entries
# written under a different format string are purged once
_CACHE_FORMAT = "avx2-v1"


def ensure_cpu_xla_flags(env=None):
    """Append the CPU compile flags to XLA_FLAGS in `env` (default
    os.environ). Must run before the process's first jax backend
    initialization to take effect; safe (no-op) afterwards. Returns the
    env mapping."""
    env = os.environ if env is None else env
    flags = env.get("XLA_FLAGS", "")
    for f in CPU_XLA_FLAGS.split():
        if f.split("=")[0] not in flags:
            flags = (flags + " " + f).strip()
    env["XLA_FLAGS"] = flags
    return env


def check_cache_fingerprint(cache_dir=None):
    """Purge the persistent compile cache when its entry FORMAT is stale.

    With the AVX2 ISA cap (see CPU_MAX_ISA_FLAG) cache entries are portable
    across hosts, so the round-4 machine-fingerprint purge is gone — a VM
    move no longer throws away the (VM-independent) TPU remote-compile
    entries (ADVICE r4). The only purge trigger left is a cache written
    before the cap existed: those CPU entries would load, warn
    (cpu_aot_loader), and silently recompile forever. A CACHE_FORMAT marker
    alongside the entries records the format; entries with a missing or
    mismatched marker are removed once. Runs once per process from
    jax_available(); bench.py and the dryrun call it directly before their
    first compile."""
    import shutil

    cache_dir = os.path.abspath(cache_dir or CACHE_DIR)
    path = os.path.join(cache_dir, "CACHE_FORMAT")
    purged = False
    try:
        if os.path.isdir(cache_dir):
            old = None
            if os.path.exists(path):
                with open(path) as f:
                    old = f.read().strip()
            has_entries = any(
                e not in ("CACHE_FORMAT", "MACHINE_FINGERPRINT")
                for e in os.listdir(cache_dir)
            )
            if old != _CACHE_FORMAT and has_entries:
                shutil.rmtree(cache_dir, ignore_errors=True)
                purged = True
        os.makedirs(cache_dir, exist_ok=True)
        with open(path, "w") as f:
            f.write(_CACHE_FORMAT)
    except Exception:  # pragma: no cover - read-only fs etc.
        pass
    return purged


def jax_available():
    if _DISABLE:
        return False
    if not _jax_state["checked"]:
        try:
            import jax

            try:
                ensure_cpu_xla_flags()
                check_cache_fingerprint()
                jax.config.update("jax_compilation_cache_dir", os.path.abspath(CACHE_DIR))
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            except Exception:
                pass
            _jax_state["available"] = True
        except Exception:  # pragma: no cover
            _jax_state["available"] = False
        _jax_state["checked"] = True
    return _jax_state["available"]


def use_device(n, threshold):
    return jax_available() and n >= threshold
