from d2r_tpu.data.dataset import (  # noqa: F401
    DataLoader,
    MSDDataset,
    MSDProcessor,
    synthetic_batch,
    write_fake_dataset,
)
