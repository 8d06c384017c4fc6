from semisupervisedobjectdetection_tpu.data.augment import (  # noqa: F401
    augment_batch,
    eval_batch,
)
from semisupervisedobjectdetection_tpu.data.loader import (  # noqa: F401
    TileLoader,
    split_dataset,
)
from semisupervisedobjectdetection_tpu.data.synthetic import (  # noqa: F401
    synthetic_batch,
    synthetic_tile,
    write_synthetic_dataset,
)
from semisupervisedobjectdetection_tpu.data.tiles import (  # noqa: F401
    TileDataset,
    list_tile_ids,
)
