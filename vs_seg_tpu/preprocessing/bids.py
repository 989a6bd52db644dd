"""BIDS dataset builder (replaces reference
preprocessing/createBIDSdataset/data_conversion_BIDS.py, which runs inside 3D
Slicer). Builds a BIDS-1.4 layout from converted DICOM cases:

  <root>/dataset_description.json
  <root>/participants.tsv + README
  <root>/sub-<id>/ses-<ses>/anat/sub-..._T1w.nii.gz (+ .json sidecar)
  <root>/derivatives/manual_segmentations/.../..._seg.nii.gz

Sidecar fields are extracted from DICOM tags like the reference's
create_sidecar_dict (data_conversion_BIDS.py:385-410).
"""

from __future__ import annotations

import csv
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from vs_seg_tpu.data import nifti
from vs_seg_tpu.preprocessing import convert
from vs_seg_tpu.preprocessing.dicom import read_dicom

SIDEcar_TAGS = [
    "Modality", "SeriesDescription", "SliceThickness", "PatientID",
    "SeriesInstanceUID", "StudyInstanceUID",
]


def bids_path(root: str, subject: str, session: str, suffix: str,
              modality_dir: str = "anat", derivative: Optional[str] = None,
              ext: str = ".nii.gz") -> str:
    """createBIDSPath equivalent (reference data_conversion_BIDS.py:306-382)."""
    base = root if derivative is None else os.path.join(root, "derivatives", derivative)
    d = os.path.join(base, f"sub-{subject}", f"ses-{session}", modality_dir)
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"sub-{subject}_ses-{session}_{suffix}{ext}")


def sidecar_from_dicom(ds) -> Dict[str, object]:
    out = {}
    for tag in SIDEcar_TAGS:
        if tag in ds:
            out[tag] = ds[tag]
    return out


def write_dataset_description(root: str, name: str = "VS-SEG-BIDS") -> None:
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "dataset_description.json"), "w") as f:
        json.dump({
            "Name": name,
            "BIDSVersion": "1.4.0",
            "DatasetType": "raw",
            "License": "CC BY 4.0",
        }, f, indent=2)
    with open(os.path.join(root, "README"), "w") as f:
        f.write(f"{name}: vestibular schwannoma T1c/T2 MRI with manual "
                "segmentations, converted from TCIA DICOM.\n")


def build_bids_dataset(case_dirs: Sequence[str], out_root: str,
                       dataset: str = "T1") -> List[str]:
    """Convert DICOM case folders into a BIDS tree. Returns written images."""
    write_dataset_description(out_root)
    written = []
    participants = []
    suffix = "ce-gad_T1w" if dataset == "T1" else "T2w"
    for i, case_dir in enumerate(case_dirs, start=1):
        subject = f"{i:03d}"
        img_files = sorted(
            os.path.join(case_dir, f) for f in os.listdir(case_dir)
            if f.startswith("IMG") and f.endswith(".dcm"))
        if not img_files:
            continue
        volume, affine = convert.load_series(img_files)
        img_path = bids_path(out_root, subject, "preop", suffix)
        nifti.save(nifti.NiftiImage(volume.astype(np.float32), affine), img_path)
        sidecar = sidecar_from_dicom(read_dicom(img_files[0]))
        with open(img_path.replace(".nii.gz", ".json"), "w") as f:
            json.dump(sidecar, f, indent=2, default=str)
        written.append(img_path)

        rtss = os.path.join(case_dir, "RTSS.dcm")
        if os.path.exists(rtss):
            contours = convert.extract_rtstruct_contours(read_dicom(rtss))
            if contours:
                seg = convert.rasterize_contours(contours, affine, volume.shape)
                seg_path = bids_path(out_root, subject, "preop",
                                     f"space-individual_desc-tumor_dseg",
                                     derivative="manual_segmentations")
                nifti.save(nifti.NiftiImage(seg, affine), seg_path)
        participants.append((f"sub-{subject}", "n/a", "n/a"))

    with open(os.path.join(out_root, "participants.tsv"), "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["participant_id", "age", "sex"])
        w.writerows(participants)
    return written
