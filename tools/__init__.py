"""Repo tooling (scale data derivation, oracle gate, scale probe)."""
