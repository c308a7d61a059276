from riskaversetrajopt_tpu.scp.driver import SAATrajOpt, SCPResult  # noqa: F401
