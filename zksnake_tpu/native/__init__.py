"""Native host-runtime helpers (C extension), built lazily with the system
compiler; everything degrades to the pure-Python paths when unavailable."""

import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build():
    src = os.path.join(_DIR, "limbcodec.c")
    ext_suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(_DIR, "_limbcodec" + ext_suffix)
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CC", "cc"),
        "-O2",
        "-shared",
        "-fPIC",
        f"-I{include}",
        src,
        "-o",
        out,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


_codec = None
_tried = False


def get_codec():
    """Returns the _limbcodec module, building it on first use; None if the
    toolchain is unavailable (callers fall back to pure Python)."""
    global _codec, _tried
    if _codec is None and not _tried:
        _tried = True
        if os.environ.get("ZKSNAKE_NO_NATIVE", "0") == "1":
            return None
        try:
            _build()
            import importlib

            _codec = importlib.import_module("zksnake_tpu.native._limbcodec")
            # self-check
            assert _codec.bytes_to_ints(_codec.ints_to_bytes([5, 7], 8), 8) == [5, 7]
        except Exception:
            _codec = None
    return _codec
