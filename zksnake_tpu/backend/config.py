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


def check_cache_fingerprint(cache_dir=None):
    """Purge the persistent compile cache when the host machine changed.

    XLA-CPU AOT cache entries embed the COMPILING machine's CPU features;
    a workspace carried to a different VM ships hundreds of MB of entries
    that each load, warn (cpu_aot_loader "machine type ... doesn't match"),
    and recompile anyway — the grind that ate the round-2/3 multichip-dryrun
    budgets (MULTICHIP_r03 tail). A MACHINE_FINGERPRINT file (hash of
    /proc/cpuinfo flags + jax version) written alongside the entries detects
    the move; on mismatch — or when entries exist with no fingerprint, i.e.
    unverifiable provenance — the whole cache is removed. Runs once per
    process from jax_available(); callers outside the library (bench.py,
    dryrun) may call it directly before their first compile."""
    import hashlib
    import shutil

    cache_dir = os.path.abspath(cache_dir or CACHE_DIR)
    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split()[2:]))
                    break
        import jax

        fp = hashlib.sha256(
            (flags + "|" + jax.__version__).encode()
        ).hexdigest()[:32]
    except Exception:  # pragma: no cover - no /proc or no jax
        return False
    path = os.path.join(cache_dir, "MACHINE_FINGERPRINT")
    purged = False
    try:
        if os.path.isdir(cache_dir):
            old = None
            if os.path.exists(path):
                with open(path) as f:
                    old = f.read().strip()
            has_entries = any(
                e != "MACHINE_FINGERPRINT" for e in os.listdir(cache_dir)
            )
            if old != fp and has_entries:
                shutil.rmtree(cache_dir, ignore_errors=True)
                purged = True
        os.makedirs(cache_dir, exist_ok=True)
        with open(path, "w") as f:
            f.write(fp)
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
