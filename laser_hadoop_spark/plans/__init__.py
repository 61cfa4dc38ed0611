"""Composed pipelines: the reference's workflow steps as DataFrame plans."""
