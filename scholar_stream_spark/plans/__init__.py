"""Catalog / plan-level wiring (view registration, role scoping)."""
