"""Execute the reference's retrieval sampler dispatch
(/root/reference/retrieval/sample_retrieval.py sampling(), :1471-1670) on
synthetic features, under the shims, and dump the resulting split.

usage: python run_sampler.py <sandbox> <dataset> <strategy> <num_samples>
           <image_dedup 0|1> <out_json>

The sandbox layout mirrors what the reference expects relative to its CWD
(= <sandbox>/retrieval):
  retrieval/output/                    (args.output_folder)
  data/<ds>/...mined.pth               (dataset_root passed to sampling)
  data/<ds>/prompts/*_prompt_tensors.pth
  data/<ds>/caption.map                (CAPTION_MAP_DICT patch target)
  data/<ds>/pre_extracted/..._train_features.pth  (fewshot feats for
                                                   I2I/I2T strategies)
"""

import argparse
import json
import logging
import os
import sys

REFERENCE = os.environ.get("SWAT_REFERENCE_DIR", "/root/reference")


def main():
    sandbox, dataset, strategy, num_samples, image_dedup, out_json = \
        sys.argv[1:7]
    here = os.path.dirname(os.path.abspath(__file__))
    tests_dir = os.path.dirname(here)
    sys.path.insert(0, os.path.join(REFERENCE, "retrieval"))
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, tests_dir)
    sys.path.insert(0, here)

    import reference_shims

    reference_shims.install()

    os.chdir(os.path.join(sandbox, "retrieval"))
    os.makedirs("output", exist_ok=True)
    # extract_mined_feature reads ../config.yml at import time (:16)
    if not os.path.exists("../config.yml"):
        with open("../config.yml", "w") as f:
            f.write(f"dataset_path: {sandbox}/data\n"
                    f"retrieved_path: {sandbox}/data\n")

    import sample_retrieval as sr
    import torch

    logger = logging.getLogger("sampler")
    logging.basicConfig(level=logging.INFO)
    sr.logger = logger
    sr.device = "cpu"
    sr.CAPTION_MAP_DICT[dataset] = f"../data/{dataset}/caption.map"

    prompts_fn = (f"../data/{dataset}/prompts/"
                  f"{dataset}_vitb32_openclip_laion400m_"
                  "most_common_name_prompt_tensors.pth")
    sr.prompt_tensors_dict = {
        "most_common_name": torch.load(prompts_fn, weights_only=False)}

    args = argparse.Namespace(
        dataset=dataset, model_cfg="vitb32_openclip_laion400m",
        sampling_method=strategy, num_samples=int(num_samples),
        sampling_threshold=0.0, zeroshot_img_filter=False,
        image_dedup=bool(int(image_dedup)), output_folder="output",
        prefix=f"diff_{strategy}", prompt_name="most_common_name",
        recal_prompt=False, database="LAION400M")

    file_list_path, sample_ct = sr.sampling(
        args, logger, model=None, preprocess=None, metrics=None,
        dataset_root=f"../data/{dataset}")

    rows = [l.strip() for l in open(file_list_path) if l.strip()]
    with open(out_json, "w") as f:
        json.dump({"rows": rows, "sample_ct": sample_ct}, f)
    print(f"SAMPLER_OK {strategy} {sample_ct}")


if __name__ == "__main__":
    main()
