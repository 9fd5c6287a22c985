from qbmx.data.loaders import (
    get_mnist,
    get_fashionmnist,
    get_medmnist,
    balance_by_undersampling,
    preprocess_images,
    shuffle_images,
    encode_labels_to_onehot,
    reshape_pad_and_flatten,
    binarize,
    synthetic_images,
    find_data_root,
)

__all__ = [
    "get_mnist",
    "get_fashionmnist",
    "get_medmnist",
    "balance_by_undersampling",
    "preprocess_images",
    "shuffle_images",
    "encode_labels_to_onehot",
    "reshape_pad_and_flatten",
    "binarize",
    "synthetic_images",
    "find_data_root",
]
