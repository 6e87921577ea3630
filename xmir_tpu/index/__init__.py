from .gallery import ShardedGalleryIndex
