"""Compatibility shim — the f128 device prover now lives in
:mod:`winterfell_tpu.prover.device_limb`, which hosts the engine-parametric
pipeline shared by the f128 and f62 limb engines."""

from .device_limb import F62Prover, F128Prover, LimbFieldProver  # noqa: F401
