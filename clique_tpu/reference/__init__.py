from clique_tpu.reference.manager import Reference, ReferenceManager

__all__ = ["Reference", "ReferenceManager"]
