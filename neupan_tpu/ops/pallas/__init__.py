from neupan_tpu.ops.pallas.mlp import dune_mlp_pallas  # noqa: F401
