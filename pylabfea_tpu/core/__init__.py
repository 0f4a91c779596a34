from pylabfea_tpu.core.tensors import *  # noqa: F401,F403
