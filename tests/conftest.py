"""Test configuration: force an 8-virtual-device CPU platform for sharding
tests and deterministic CPU numerics for torch-parity tests.

Must set env vars BEFORE jax is imported anywhere.
"""
import os
import sys

if os.environ.get("CISTA_TEST_TPU") == "1":
    # opt-in: run chip-gated tests (e.g. the flagship fast-path drift
    # check) on the real TPU backend instead of the forced CPU platform
    import jax  # noqa: E402
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # A sitecustomize hook may force JAX_PLATFORMS to the TPU tunnel;
    # override post-import (env vars alone are not enough).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def add_reference_to_path():
    """Make the upstream torch reference importable (tests only — the compute
    path never touches it). Shims omegaconf (absent from this image)."""
    # APPEND (not prepend): the reference also ships top-level modules named
    # train/test_with_flow/... which must not shadow this repo's CLIs.
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    # pandas >= 2.2 removed read_csv(delim_whitespace=...), which the
    # reference's event readers use; translate to sep=r"\s+".
    import pandas as _pd

    if not getattr(_pd.read_csv, "_delim_ws_shim", False):
        _orig_read_csv = _pd.read_csv

        def _read_csv(*a, **kw):
            if kw.pop("delim_whitespace", False):
                kw.setdefault("sep", r"\s+")
            return _orig_read_csv(*a, **kw)

        _read_csv._delim_ws_shim = True
        _pd.read_csv = _read_csv
    if "omegaconf" not in sys.modules:
        import types

        shim = types.ModuleType("omegaconf")

        class _OmegaConf:
            @staticmethod
            def create(d):
                return types.SimpleNamespace(**d)

        shim.OmegaConf = _OmegaConf
        sys.modules["omegaconf"] = shim
