"""PlonK (parity with reference python/zksnake/plonk/__init__.py)."""

from .protocol import Plonk
from .serialization import Proof, ProvingKey, VerifyingKey
