from .nodes import GaussianBundle, concat_bundles, NODE_CLASS_IDS
