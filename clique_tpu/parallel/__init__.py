from clique_tpu.parallel.mesh import make_mesh, sharded_align_step

__all__ = ["make_mesh", "sharded_align_step"]
