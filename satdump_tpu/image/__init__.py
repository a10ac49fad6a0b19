from satdump_tpu.image.io import load_img, save_img  # noqa: F401
