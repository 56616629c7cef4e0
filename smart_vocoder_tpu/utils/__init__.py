"""Checkpointing, torch-checkpoint import, logging, plotting (L8)."""
