"""Composed multi-operator plans (reference views / MVs re-expressed)."""
