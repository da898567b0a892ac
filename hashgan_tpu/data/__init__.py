from hashgan_tpu.data.lists import parse_list_file, write_list_file  # noqa: F401
from hashgan_tpu.data.synthetic import SyntheticImageDataset, make_splits  # noqa: F401
from hashgan_tpu.data.pipeline import BatchIterator, pair_batch_iterator  # noqa: F401
