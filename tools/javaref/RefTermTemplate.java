import java.io.File;
import java.io.FileInputStream;
import java.util.Arrays;

import edu.pitt.dbmi.nlp.noble.coder.NobleCoder;
import edu.pitt.dbmi.nlp.noble.coder.processor.DocumentProcessor;
import edu.pitt.dbmi.nlp.noble.extract.model.Template;
import edu.pitt.dbmi.nlp.noble.extract.model.TemplateDocument;
import edu.pitt.dbmi.nlp.noble.extract.model.TemplateFactory;
import edu.pitt.dbmi.nlp.noble.ontology.owl.OOntology;
import edu.pitt.dbmi.nlp.noble.terminology.CompositTerminology;
import edu.pitt.dbmi.nlp.noble.terminology.impl.NobleCoderTerminology;
import edu.pitt.dbmi.nlp.noble.tools.ConText;
import edu.pitt.dbmi.nlp.noble.tools.TextTools;
import edu.pitt.dbmi.nlp.noble.util.CSVExporter;
import edu.pitt.dbmi.nlp.noble.util.ConceptImporter;

/**
 * Headless TemplateFactory.importTerminologyTemplate parity driver:
 * build a PERSISTED terminology from an OBO file (the import method
 * re-opens it by name), call the actual importTerminologyTemplate
 * (TemplateFactory.java:127-166 — every root concept becomes one
 * type=finding / value.domain=self TemplateItem), then replay the
 * InformationExtractor processing loop over every .txt in a directory
 * and write the CSVExporter result matrix (RESULTS.tsv) for diffing
 * against the Spark engine's template_from_terminology +
 * extract_matrix on identical inputs.
 *
 * Processing mirrors RefExtract (same InformationExtractor
 * :622-649/:658-682 flow, same pinned ConText deviation). Note the
 * template's BACKGROUND DocumentFilter is constructed by the factory
 * but never applied on this path: every doc.getFilters().addAll(...)
 * call in InformationExtractor.java (:607,:627,:669) and
 * TemplateDocument.getFilteredDocument() itself are commented out in
 * the reference.
 *
 * Usage: java RefTermTemplate terms.obo docs_dir out_dir [context.owl]
 */
public class RefTermTemplate {
    public static void main(String[] args) throws Exception {
        NobleCoderTerminology.setPersistenceDirectory(
                new File("/tmp/noble_terms_tt"));
        ConceptImporter imp = ConceptImporter.getInstance();
        imp.setInMemory(false);   // importTerminologyTemplate re-opens by name
        imp.setCompact(false);
        NobleCoderTerminology build = new NobleCoderTerminology();
        imp.loadOBO(build, new File(args[0]));   // loads + saves under obo stem
        build.dispose();
        String name = new File(args[0]).getName().replaceAll("\\.obo$", "");
        Template template = TemplateFactory.importTerminologyTemplate(name);

        File outDir = new File(args[2]);
        outDir.mkdirs();
        CSVExporter csv = new CSVExporter(outDir);
        CompositTerminology terminology = new CompositTerminology();
        terminology.addTerminology(template.getTerminology());
        NobleCoder coder = new NobleCoder(terminology);
        if (args.length > 3) {
            coder.setConText(new ConText(
                    OOntology.loadOntology(new File(args[3]))));
            coder.setContextDetection(true);
        } else {
            coder.setContextDetection(false);
        }
        File[] files = new File(args[1]).listFiles();
        Arrays.sort(files);
        for (File f : files) {
            if (!f.getName().endsWith(".txt"))
                continue;
            String text = TextTools.getText(new FileInputStream(f));
            TemplateDocument doc = new TemplateDocument();
            doc.setTitle(f.getName());
            doc.setLocation(f.getAbsolutePath());
            doc.setText(text);
            doc.addTemplate(template);
            doc.setDocumentType(DocumentProcessor.suggestDocumentType(text));
            coder.process(doc);
            for (Template t : doc.getTemplates()) {
                if (t.isAppropriate(doc))
                    doc.addItemInstances(t, t.process(doc));
            }
            csv.export(doc);
        }
        csv.flush();
        System.out.println("done");
    }
}
