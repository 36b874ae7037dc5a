"""Version of the engine (reference: src/utils/version.cpp:3-9)."""

__version__ = "0.1.0"
