"""Batch inference CLI (ref crates/cli)."""
