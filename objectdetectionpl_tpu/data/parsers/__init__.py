"""Per-dataset annotation parsers.

Each parser exposes ``classes`` (list[str]), ``__len__``, and
``__getitem__(i) -> Example`` (RGB uint8 image + top-left pixel xywh boxes +
0-based labels).  Degenerate / negative boxes are dropped at parse time, the
same guards the reference applies (e.g. dataset/Pascal.py:105-115).
"""

from objectdetectionpl_tpu.data.parsers.asiatraffic import AsiaTrafficParser  # noqa: F401
from objectdetectionpl_tpu.data.parsers.bdd100k import BDD100KParser  # noqa: F401
from objectdetectionpl_tpu.data.parsers.coco import COCOParser  # noqa: F401
from objectdetectionpl_tpu.data.parsers.container import ContainerParser  # noqa: F401
from objectdetectionpl_tpu.data.parsers.pascal import VOCParser  # noqa: F401
from objectdetectionpl_tpu.data.parsers.widerperson import WiderPersonParser  # noqa: F401
