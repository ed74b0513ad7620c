from pandelos_tpu.io.faa import FaaDataset, read_faa, write_faa  # noqa: F401
from pandelos_tpu.io.net import read_net, write_net  # noqa: F401
from pandelos_tpu.io.clus import read_clus, write_clus  # noqa: F401
