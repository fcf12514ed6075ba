from tcct_tpu.infer.importer import (
    import_torch_checkpoint,
    export_torch_state,
    export_torch_checkpoint,
)
