"""Shared fixtures. The CPU-mesh environment setup lives in
_batrack_pytest_env.py (loaded via pyproject addopts before pytest capture
starts)."""

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
