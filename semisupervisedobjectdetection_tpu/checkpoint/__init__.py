from semisupervisedobjectdetection_tpu.checkpoint.hf_import import (  # noqa: F401,E501
    import_hf_model,
    import_torch_state_dict,
    load_torch_checkpoint,
)
from semisupervisedobjectdetection_tpu.checkpoint.orbax_io import (  # noqa: F401,E501
    BestCheckpointer,
    restore_state,
    save_state,
)
