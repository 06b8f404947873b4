"""DataModules: per-dataset split semantics + loader construction.

Parity with the reference's six ``pl.LightningDataModule``s (run.py:41-50,
SURVEY.md §2.2) plus a Synthetic module for CPU-runnable integration tests:

- VOC:        80/20 random split of 'train'; test = 'val' list
              (dataset/Pascal.py:205-209)
- COCO:       train2017 / val2017 by file; test = val (dataset/Coco.py:250-251)
- BDD100K:    train/ and val/ directories; test = val (dataset/BDD100K.py:226-252)
- WiderPerson: train/val/test id lists (dataset/WiderPerson.py:241-248)
- Mosquito:   80/20 random split; test = full set (dataset/Container.py:197-233)
- AsiaTraffic: 80/20 random split; test = full set (dataset/AsiaTraffic.py:...)
"""

from __future__ import annotations

from typing import List, Optional

from objectdetectionpl_tpu.data import synthetic
from objectdetectionpl_tpu.data.pipeline import Loader, random_split_indices


class DataModule:
    """Holds train/val/test parsers + split indices; builds Loaders."""

    name = "base"

    def __init__(self, cfg):
        self.cfg = cfg
        self.train_parser = None
        self.val_parser = None
        self.test_parser = None
        self.train_idx = None
        self.val_idx = None

    def setup(self, stage: str = "fit"):
        raise NotImplementedError

    def get_class(self) -> List[str]:
        raise NotImplementedError

    def _loader(self, parser, shuffle, indices=None, limit=None,
                batch_size: Optional[int] = None, sharded: bool = False,
                split: str = "train") -> Loader:
        cfg = self.cfg
        if sharded:
            from objectdetectionpl_tpu.parallel import data_shard
            num_shards, shard_id = data_shard()
        else:
            num_shards, shard_id = 1, 0
        cache_dir = None
        if cfg.cache_dir:
            # packed pre-decoded cache per (dataset, parser, geometry); built
            # once up front, then epochs are memmap gathers (data/cache.py).
            # Keyed by parser object so train/val index-splits of one parser
            # share a single cache pass.
            import os
            from objectdetectionpl_tpu.data import cache as cache_lib
            S = cfg.effective_img_size
            roles = getattr(self, "_cache_roles", {})
            self._cache_roles = roles
            role = roles.setdefault(id(parser), split)
            cache_dir = os.path.join(
                cfg.cache_dir,
                f"{self.name}_{role}_{S}px" + ("_lb" if cfg.letterbox else ""))
            cache_lib.build_packed_cache(parser, S, cache_dir,
                                         letterbox=cfg.letterbox)
        return Loader(parser, cfg.effective_img_size,
                      batch_size or cfg.batch_size, cfg.max_boxes,
                      shuffle=shuffle, seed=cfg.seed, indices=indices,
                      limit_batches=limit, letterbox=cfg.letterbox,
                      num_shards=num_shards, shard_id=shard_id,
                      cache_dir=cache_dir)

    def train_dataloader(self) -> Loader:
        # train batches are process-sharded (per-host input pipeline);
        # val/test run the full set on every host so their metrics need no
        # cross-host reduction.
        return self._loader(self.train_parser, True, self.train_idx,
                            self.cfg.limit_train_batches, sharded=True,
                            split="train")

    def val_dataloader(self) -> Loader:
        return self._loader(self.val_parser, False, self.val_idx,
                            self.cfg.limit_val_batches, split="val")

    def test_dataloader(self) -> Loader:
        return self._loader(self.test_parser, False, None,
                            self.cfg.limit_test_batches, split="test")


class SyntheticModule(DataModule):
    name = "Synthetic"

    def setup(self, stage: str = "fit"):
        size = self.cfg.synthetic_size
        self.train_parser = synthetic.SyntheticParser(size, seed=1)
        self.val_parser = synthetic.SyntheticParser(max(size // 4, 4), seed=2)
        self.test_parser = synthetic.SyntheticParser(max(size // 4, 4), seed=3)

    def get_class(self):
        return synthetic.SYNTHETIC_CLASSES


class VOCModule(DataModule):
    name = "VOC"

    def setup(self, stage: str = "fit"):
        from objectdetectionpl_tpu.data.parsers import VOCParser
        root = self.cfg.data_root
        year = str(self.cfg.extra.get("voc_year", "2012"))
        train = VOCParser(root, year, "train")
        self.train_idx, self.val_idx = random_split_indices(
            len(train), 0.8, self.cfg.seed)
        self.train_parser = self.val_parser = train
        self.test_parser = VOCParser(root, year, "val")

    def get_class(self):
        from objectdetectionpl_tpu.data.parsers.pascal import VOC_CLASSES
        return VOC_CLASSES


class COCOModule(DataModule):
    name = "COCO"

    def setup(self, stage: str = "fit"):
        from objectdetectionpl_tpu.data.parsers import COCOParser
        root = self.cfg.data_root
        year = str(self.cfg.extra.get("coco_year", "2017"))
        if stage in ("fit", "all"):
            self.train_parser = COCOParser(root, year, "train")
            self.val_parser = COCOParser(root, year, "val")
        if stage in ("test", "all") or self.val_parser is None:
            self.test_parser = COCOParser(root, year, "val")

    def get_class(self):
        from objectdetectionpl_tpu.data.parsers.coco import COCO_CLASSES
        return COCO_CLASSES


class BDD100KModule(DataModule):
    name = "BDD100K"

    def setup(self, stage: str = "fit"):
        from objectdetectionpl_tpu.data.parsers import BDD100KParser
        root = self.cfg.data_root
        if stage in ("fit", "all"):
            self.train_parser = BDD100KParser(root, "train")
            self.val_parser = BDD100KParser(root, "val")
        if stage in ("test", "all") or self.val_parser is None:
            self.test_parser = BDD100KParser(root, "val")

    def get_class(self):
        from objectdetectionpl_tpu.data.parsers.bdd100k import BDD_CLASSES
        return BDD_CLASSES


class WiderPersonModule(DataModule):
    name = "WiderPerson"

    def setup(self, stage: str = "fit"):
        from objectdetectionpl_tpu.data.parsers import WiderPersonParser
        root = self.cfg.data_root
        self.train_parser = WiderPersonParser(root, "train")
        self.val_parser = WiderPersonParser(root, "val")
        self.test_parser = WiderPersonParser(root, "val")

    def get_class(self):
        from objectdetectionpl_tpu.data.parsers.widerperson import \
            WIDERPERSON_CLASSES
        return WIDERPERSON_CLASSES


class MosquitoModule(DataModule):
    name = "MosquitoContainer"

    def setup(self, stage: str = "fit"):
        from objectdetectionpl_tpu.data.parsers import ContainerParser
        full = ContainerParser(self.cfg.data_root)
        self.train_idx, self.val_idx = random_split_indices(
            len(full), 0.8, self.cfg.seed)
        self.train_parser = self.val_parser = full
        self.test_parser = full

    def get_class(self):
        from objectdetectionpl_tpu.data.parsers.container import \
            CONTAINER_CLASSES
        return CONTAINER_CLASSES


class AsiaModule(DataModule):
    name = "AsiaTraffic"

    def setup(self, stage: str = "fit"):
        from objectdetectionpl_tpu.data.parsers import AsiaTrafficParser
        full = AsiaTrafficParser(self.cfg.data_root)
        self.train_idx, self.val_idx = random_split_indices(
            len(full), 0.8, self.cfg.seed)
        self.train_parser = self.val_parser = full
        self.test_parser = full

    def get_class(self):
        from objectdetectionpl_tpu.data.parsers.asiatraffic import ASIA_CLASSES
        return ASIA_CLASSES


DATAMODULES = {
    "Synthetic": SyntheticModule,
    "VOC": VOCModule,
    "COCO": COCOModule,
    "BDD100K": BDD100KModule,
    "WiderPerson": WiderPersonModule,
    "MosquitoContainer": MosquitoModule,
    "AsiaTraffic": AsiaModule,
}


def build_datamodule(cfg) -> DataModule:
    """String dispatch, parity with load_data (run.py:41-50)."""
    try:
        dm = DATAMODULES[cfg.data_module](cfg)
    except KeyError:
        raise ValueError(f"unknown data_module {cfg.data_module!r}") from None
    dm.setup(cfg.stage)
    return dm
