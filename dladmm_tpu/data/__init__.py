from dladmm_tpu.data.synthetic import (  # noqa: F401
    SyntheticBatch,
    make_dictionary,
    make_batch,
    batch_stream,
)
