#!/usr/bin/env Rscript
# Times the reference package's run() on (a) the bundled oligodendroglioma
# example and (b) a 10k-cell synthetic matrix mirroring
# benchmarks/scale100k_run.py's generator (3 planted CNV groups).
# Prints one JSON line per configuration for BENCHMARKS.md.
suppressMessages(library(infercnv))

time_run <- function(label, obj, ...) {
    t0 <- Sys.time()
    out <- tempfile()
    run(obj, out_dir=out, cutoff=1, HMM=TRUE, denoise=TRUE,
        analysis_mode="subclusters", num_threads=4, ...)
    dt <- as.numeric(difftime(Sys.time(), t0, units="secs"))
    cat(sprintf('{"config": "%s", "seconds": %.1f}\n', label, dt))
}

# (a) bundled example (184 cells)
data(infercnv_data_example); data(infercnv_annots_example)
data(infercnv_genes_example)
obj <- CreateInfercnvObject(
    raw_counts_matrix=infercnv_data_example,
    gene_order_file=infercnv_genes_example,
    annotations_file=infercnv_annots_example,
    ref_group_names=c("normal"))
time_run("bundled_184_cells", obj)

# (b) 10k synthetic cells, 9k genes, 22 chr, planted CNVs
set.seed(0)
C <- 10000; G <- 9000; n_chr <- 22
sizes <- round(seq(800, 120, length.out=n_chr))
sizes <- round(sizes / sum(sizes) * G); sizes[1] <- sizes[1] + G - sum(sizes)
chrs <- rep(paste0("chr", seq_len(n_chr)), sizes)
gene_means <- rgamma(G, 2, scale=8)
lam <- matrix(rep(gene_means, C), nrow=G)
n_ref <- C %/% 5; per <- (C - n_ref) %/% 3
ann <- c(rep("normal", n_ref), rep(paste0("malignant_", 1:3), each=per),
         rep("malignant_3", C - n_ref - 3*per))
starts <- cumsum(c(1, head(sizes, -1)))
for (g in 1:3) {
    cells <- which(ann == paste0("malignant_", g))
    dci <- (2*g - 1) %% n_chr + 1; aci <- (2*g) %% n_chr + 1
    dsel <- which(chrs == paste0("chr", dci)); asel <- which(chrs == paste0("chr", aci))
    lam[dsel, cells] <- lam[dsel, cells] * 0.5
    lam[asel, cells] <- lam[asel, cells] * 2.0
}
counts <- matrix(rpois(G*C, lam), nrow=G,
                 dimnames=list(paste0("g", 1:G), paste0("c", 1:C)))
gene_order <- data.frame(chr=chrs, start=(1:G)*1000, stop=(1:G)*1000+500,
                         row.names=paste0("g", 1:G))
annots <- data.frame(ann, row.names=paste0("c", 1:C))
obj10k <- CreateInfercnvObject(raw_counts_matrix=counts,
                               gene_order_file=gene_order,
                               annotations_file=annots,
                               ref_group_names=c("normal"))
time_run("synthetic_10k_cells", obj10k)
