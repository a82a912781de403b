"""COCO assembly invariants: dense IDs, validator, split, balance."""

import numpy as np

from aerial_conversion_ray.config import EngineConfig
from aerial_conversion_ray.pipelines import coco

CFG = EngineConfig(pages_rep=4)


def test_image_ids_dense_column_major(sf_dir):
    imgs = coco.coco_images(sf_dir, CFG)
    assert (imgs["image_id"].to_numpy() == np.arange(len(imgs))).all()
    # column-major (col_off, row_off) lexicographic order
    key = list(zip(imgs["col_off"], imgs["row_off"]))
    assert key == sorted(key)


def test_annotation_ids_dense(sf_dir):
    anns = coco.coco_annotations(sf_dir, CFG).to_pandas()
    ids = np.sort(anns["annot_id"].to_numpy())
    assert (ids == np.arange(len(anns))).all()
    # dense ids follow (image_id, page_id) order
    ordered = anns.sort_values("annot_id")
    key = list(zip(ordered["image_id"], ordered["page_id"]))
    assert key == sorted(key)


def test_validator_clean(sf_dir):
    v = coco.coco_validate(sf_dir, CFG).to_pandas()
    assert set(v["rule"]) == {
        "bbox_nonneg",
        "area_eq_wh",
        "iscrowd_01",
        "image_fk",
        "category_fk",
    }
    assert (v["n_violations"] == 0).all()


def test_split_covers_all(sf_dir):
    sp = coco.coco_split(sf_dir, CFG).to_pandas()
    assert set(sp["split"]) <= {"train", "test"}
    test_imgs = sp.loc[sp["split"] == "test", "image_id"].unique()
    assert (test_imgs % coco.TEST_MOD == 0).all()


def test_balance_reaches_target(sf_dir):
    stats = coco.class_stats(sf_dir, CFG).to_pandas()
    removal = set(coco.balance_removal(sf_dir, CFG)["image_id"])
    anns = coco.coco_annotations(sf_dir, CFG).to_pandas()
    dominant = stats.sort_values(["n_annotations", "category_id"])["category_id"].iloc[-1]
    target = int(np.floor(np.median(stats["n_annotations"])))
    kept = anns[
        (anns["category_id"] == dominant) & (~anns["image_id"].isin(removal))
    ]
    assert len(kept) <= target


def test_stratified_split_exact_quota(sf_dir):
    """Every class gets EXACTLY count // DEN test annotations, and the
    test rows are the lowest-ranked annot_ids of each class."""
    sp = coco.stratified_split(sf_dir, CFG).to_pandas()
    for cat, g in sp.groupby("category_id"):
        n_test = int((g["split"] == "test").sum())
        assert n_test == len(g) // coco.STRAT_TEST_DEN
        g = g.sort_values("annot_id")
        assert (g["split"].to_numpy()[:n_test] == "test").all()


def test_drop_small_classes_threshold(sf_dir):
    """Kept classes all have >= min_count members; dropped ones fewer;
    min_count=1 is the identity (nothing to drop)."""
    mc = 10
    kept = coco.drop_small_classes(sf_dir, CFG, min_count=mc).to_pandas()
    sizes = kept.groupby(["lang", "source"]).size()
    assert (sizes >= mc).all()
    from aerial_conversion_ray.pipelines import spatial
    full = spatial.tile_clip_join(sf_dir, CFG).count()
    assert coco.drop_small_classes(sf_dir, CFG, min_count=1).count() == full


def test_coco_smallsides_fused_parity(sf_dir):
    """The fused one-scan small-side pass returns byte-identical
    images / categories / offsets to the three standalone passes."""
    from aerial_conversion_ray.pipelines import coco as c
    from aerial_conversion_ray.pipelines import spatial
    from aerial_conversion_ray.config import EngineConfig

    cfg = EngineConfig()
    clip = spatial.tile_clip_join(sf_dir, cfg).select_columns(
        ["page_id", "tile_id", "lang", "bbox_x", "bbox_y", "bbox_w", "bbox_h"]
    )
    images, cats, offsets = c._coco_smallsides(cfg, clip)
    assert images.reset_index(drop=True).equals(
        c._images_df(sf_dir, cfg).reset_index(drop=True)
    )
    assert cats.reset_index(drop=True).equals(
        c.coco_categories(sf_dir, cfg).reset_index(drop=True)
    )
    assert offsets == c._bucket_offsets(sf_dir, cfg, images)
