from neupan_tpu.models import obs_point_net  # noqa: F401
