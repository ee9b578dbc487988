from neupan_tpu.ops.qp import ADMMConfig, QPData, QPSolution, solve_qp, solve_qp_batch  # noqa: F401
