from uegan_tpu.convert.torch_import import (
    import_generator,
    import_discriminator,
    import_uegan_checkpoint,
    import_vgg19,
    import_nima,
)

__all__ = [
    "import_generator",
    "import_discriminator",
    "import_uegan_checkpoint",
    "import_vgg19",
    "import_nima",
]
