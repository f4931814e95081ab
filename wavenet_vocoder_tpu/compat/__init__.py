"""Compatibility shims for migrating from the reference implementation."""
