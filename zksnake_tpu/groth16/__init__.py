"""Groth16 (parity with reference python/zksnake/groth16/__init__.py)."""

from .protocol import Groth16
from .serialization import Proof, ProvingKey, VerifyingKey
